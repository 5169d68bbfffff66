"""Execute the reference's OWN eval.py::validate end-to-end (CPU torch).

The strongest metric-level oracle available in this image: imports the real
/root/reference sources (eval.py:106-283 — per-image DiceLoss, sklearn
calculate_metrics via utils.py:388-424, AverageMeter averaging) and runs the
full loop on a labeled dataset, so the six final meter averages of this
framework's eval.py can be asserted against the reference's executed code,
not a transliteration (VERDICT r2 "Next round" #2).

Only the packages genuinely absent from this image are stubbed, each as a
faithful transliteration of the real library's algorithm:

* timm.utils.AverageMeter — timm/utils/metrics.py (val/sum/count/avg); the
  stub additionally records instances so the test can read validate()'s
  internal meters (batch_time, loss, acc, f1, precision, recall, jaccard —
  creation order at eval.py:115-121).
* torchvision.transforms — Resize (PIL-backed, like torchvision's PIL path),
  ToTensor (HWC/255 -> CHW), ToPILImage (float CHW -> *255 truncation ->
  PIL), Compose, InterpolationMode.
* skimage.filters.threshold_otsu — the skimage algorithm (histogram over
  [min, max], between-class variance argmax, left-bin return) transliterated
  in numpy.
* wandb — inert (validate is run with wandb disabled).

Environment shims (no numeric effect, documented): np.int = int (alias
removed in numpy>=1.24; the reference predates that) and Tensor.cuda -> self
(no CUDA in this image; the reference's own code path already keeps data on
`device` = CPU everywhere it matters).

Used by tests/test_reference_validate.py and tools/parity_trained.py.
"""

from __future__ import annotations

import importlib.util
import logging
import sys
import types

import numpy as np

REF = "/root/reference/Self-supervised_segmentation"


class AverageMeter:
    """timm.utils.AverageMeter transliteration with an instance registry."""

    registry: list["AverageMeter"] = []

    def __init__(self):
        AverageMeter.registry.append(self)
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def _skimage_threshold_otsu(image):
    """skimage.filters.threshold_otsu for integer images: histogram over the
    observed [min, max] range, argmax of w1*w2*(m1-m2)^2, returns the LEFT
    bin value of the best split (skimage/filters/thresholding.py)."""
    image = np.asarray(image)
    lo, hi = int(image.min()), int(image.max())
    counts = np.bincount(image.ravel().astype(np.int64), minlength=hi + 1)[lo:].astype(np.float64)
    bin_centers = np.arange(lo, hi + 1, dtype=np.float64)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        m1 = np.cumsum(counts * bin_centers) / w1
        m2 = (np.cumsum((counts * bin_centers)[::-1]) / w2[::-1])[::-1]
        var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return bin_centers[:-1][np.argmax(var12)]


def install_stubs():
    """Install the import stubs and shims; idempotent."""
    import torch
    from PIL import Image

    if not hasattr(np, "int"):  # removed alias the reference's data.py uses
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    import importlib.machinery

    def _stub_module(name):
        m = types.ModuleType(name)
        # a real spec so importlib.util.find_spec(name) (e.g. transformers'
        # availability probing) doesn't choke on __spec__ = None
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "timm" not in sys.modules:
        timm = _stub_module("timm")
        timm_utils = _stub_module("timm.utils")
        timm_utils.AverageMeter = AverageMeter
        timm.utils = timm_utils
        sys.modules["timm"] = timm
        sys.modules["timm.utils"] = timm_utils

    if "wandb" not in sys.modules:
        wandb = _stub_module("wandb")
        wandb.login = wandb.watch = wandb.log = wandb.finish = lambda *a, **k: None
        wandb.init = lambda *a, **k: None
        wandb.Image = lambda *a, **k: None
        sys.modules["wandb"] = wandb

    # another harness (tests/test_reference_oracle.py) may have installed a
    # narrower skimage stub already — augment rather than skip, so whichever
    # imports first, every name the validate path touches exists
    sk = sys.modules.get("skimage") or types.ModuleType("skimage")
    sys.modules["skimage"] = sk

    def _sub(name):
        full = f"skimage.{name}"
        m = sys.modules.get(full) or getattr(sk, name, None) or types.ModuleType(full)
        sys.modules[full] = m
        setattr(sk, name, m)
        return m

    filters = _sub("filters")
    filters.threshold_otsu = _skimage_threshold_otsu
    if not callable(getattr(filters, "threshold_yen", None)):
        filters.threshold_yen = None  # unused on the validate paths
    _sub("transform").resize = None  # imported by data.py, unused for labeled eval
    for sub, names in {
        "morphology": ["remove_small_objects", "binary_closing", "disk"],
        "measure": ["label", "regionprops"],
        "color": ["label2rgb"],
    }.items():
        m = _sub(sub)
        for name in names:
            if not hasattr(m, name):
                setattr(m, name, None)
    _sub("segmentation")

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class InterpolationMode:
            NEAREST = Image.Resampling.NEAREST
            BILINEAR = Image.Resampling.BILINEAR
            BICUBIC = Image.Resampling.BICUBIC

        class Resize:
            # torchvision's PIL backend: img.resize((w, h), pil_filter)
            def __init__(self, size, interpolation=Image.Resampling.BILINEAR):
                self.size = size if isinstance(size, (tuple, list)) else (size, size)
                self.interpolation = interpolation

            def __call__(self, img):
                h, w = self.size
                return img.resize((w, h), self.interpolation)

        class ToTensor:
            def __call__(self, pic):
                a = np.asarray(pic, np.uint8)
                if a.ndim == 2:
                    a = a[:, :, None]
                return torch.from_numpy(a.transpose(2, 0, 1).astype(np.float32) / 255.0)

        class ToPILImage:
            # float CHW tensor: *255, truncate to uint8 (tensor.byte()), HWC
            def __call__(self, pic):
                a = pic.detach().cpu().numpy()
                if np.issubdtype(a.dtype, np.floating):
                    a = (a * 255).astype(np.uint8)
                a = a.transpose(1, 2, 0)
                return Image.fromarray(a.squeeze(2) if a.shape[2] == 1 else a)

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        for cls in (InterpolationMode, Resize, ToTensor, ToPILImage, Compose):
            setattr(transforms, cls.__name__, cls)
        tv.transforms = transforms
        datasets = types.ModuleType("torchvision.datasets")
        datasets.ImageFolder = None  # imported by data.py, unused here
        tv.datasets = datasets
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.datasets"] = datasets

    import matplotlib

    matplotlib.use("Agg")


def import_reference_eval():
    """-> (ref_eval module, ref_vits module). Installs stubs first."""
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import dino.vision_transformer as ref_vits

        spec = importlib.util.spec_from_file_location("ref_eval", REF + "/eval.py")
        ref_eval = importlib.util.module_from_spec(spec)
        sys.modules["ref_eval"] = ref_eval
        spec.loader.exec_module(ref_eval)
    finally:
        # leaving REF on sys.path would shadow this repo's same-named CLI
        # modules (mim/eval/utils/...) for anything imported later in the
        # same process — a test-order dependency (r3 review finding)
        while REF in sys.path:
            sys.path.remove(REF)
    assert ref_vits.__file__.startswith(REF)
    # this image's sklearn returns Python floats; the reference's called
    # `.item()` on the (then-)numpy scalars — restore the old return type,
    # numerically identical
    _orig_metrics = ref_eval.calculate_metrics
    ref_eval.calculate_metrics = lambda t, p: [np.float64(x) for x in _orig_metrics(t, p)]
    return ref_eval, ref_vits


def make_args(eval_dataset_path, image_size=96, method="ours", crop=1,
              batch_size=1, median_filter=1):
    """An argparse-shaped namespace with the reference eval.py defaults."""
    return types.SimpleNamespace(
        arch="vit_small", patch_size=8, pretrained_weights="",
        checkpoint_key="teacher", eval_dataset_path=eval_dataset_path,
        image_size=image_size, output_dir="", threshold=0.1, crop=crop,
        region_query=False, query_analysis=False, query_rate=10,
        save_query=False, save_feature=False, batch_size=batch_size,
        wandb=False, tag="", method=method, median_filter=median_filter,
    )


def run_reference_validate(model, args):
    """Run the reference's validate() (eval.py:106-283) and return the six
    final meter averages as a dict. `model` is a reference torch ViT."""
    import torch

    ref_eval, _ = import_reference_eval()
    # numpy-2 compat shim for the reference's own code: data.py:292 computes
    # `args.image_size // np.int8(np.sqrt(args.crop))`, and numpy>=2 refuses
    # to cast a python int >127 to the scalar's dtype (OverflowError at any
    # image_size>127). The int8 only ever holds sqrt(crop) in {1,2,4}, so
    # widening it reproduces the numpy<2 result exactly. Scoped to the
    # loader build and restored immediately.
    import numpy as _np

    _orig_int8 = _np.int8
    _np.int8 = _np.int32
    try:
        data_loader = ref_eval.build_eval_loader(args)
    finally:
        _np.int8 = _orig_int8
    logger = logging.getLogger("ref_validate_null")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    AverageMeter.registry.clear()
    acc, f1, loss = ref_eval.validate(
        args, data_loader, model, torch.device("cpu"), logger, sys.modules["wandb"])
    meters = AverageMeter.registry
    assert len(meters) == 7, len(meters)  # eval.py:115-121 creation order
    _bt, m_loss, m_acc, m_f1, m_prec, m_rec, m_jac = meters
    assert (m_acc.avg, m_f1.avg, m_loss.avg) == (acc, f1, loss)
    return {
        "loss": m_loss.avg, "dice": 1.0 - m_loss.avg, "acc": m_acc.avg,
        "f1": m_f1.avg, "precision": m_prec.avg, "recall": m_rec.avg,
        "jaccard": m_jac.avg, "n": m_loss.count,
    }
