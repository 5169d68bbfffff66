"""Host-side data pipeline: image IO, augmentation, masking, batching.

The host does only the grain work (decode, PIL resize, augmentation RNG);
everything tensor-shaped moves to the device as whole batches. Tiling of
large mosaics happens *on device* (ops/stitch.py), not here.
"""

from .datasets import (
    EvalSample,
    build_eval_samples,
    build_simmim_device_loader,
    build_simmim_loader,
    list_images,
    load_gray_resized,
    load_rgb_resized,
)
from .mask_generator import MaskGenerator
