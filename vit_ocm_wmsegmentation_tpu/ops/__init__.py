"""TPU-fusable segmentation / image ops.

Everything here is shape-static and jittable, so the whole
attention -> smooth -> blend -> threshold -> stitch post-processing chain of the
reference (which round-trips GPU->CPU per image via cv2/skimage/sklearn) fuses
into a single XLA graph on TPU.
"""

from .attention import cls_row_attention, mha, mha_auto, mha_fused
from . import chan_vese  # module, not the function: keeps `ops.chan_vese.chan_vese` importable
# the flash_attention FUNCTION re-export below shadows its submodule on
# attribute imports; this alias is the supported way to reach the module's
# mutable route knobs (SAVE_P) without an importlib dance
from . import flash_attention as flash_attention_mod
from .clahe import adaptive_histogram_equalization
from .cluster import kmeans2, kmeans_feature_mask, kmeans_mask_image, kmeans_mask_ours
from .filters import median_filter
from .flash_attention import flash_attention, flash_attention_trainable, mha_flash
from .metrics import calculate_metrics, dice_bce_loss, dice_loss, roc_auc
from .normalize import l1_normalize, l2_normalize, softmax_normalize, zscore_normalize
from .resize import resize_bicubic_torch, resize_linear_cv2, smooth_attention, upsample_nearest
from .stitch import concat_crops, concat_crops_overlap, extract_tiles, stitch_blended, tile_starts
from .threshold import (
    min_max_normalize,
    mult_blend_u8,
    otsu_binary_u8,
    otsu_threshold_u8,
    threshold_multiplicative,
    threshold_ours,
    yen_binary_u8,
    yen_threshold_u8,
)
