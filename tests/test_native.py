"""Native C++ kernels vs scipy/cv2 oracles."""

import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from vit_ocm_wmsegmentation_tpu import native
from vit_ocm_wmsegmentation_tpu.ops.morphology import disk

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

_EIGHT = np.ones((3, 3), bool)


def _mask(seed=0, shape=(64, 64), p=0.4):
    return np.random.default_rng(seed).random(shape) < p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_label_matches_scipy(seed):
    m = _mask(seed)
    labels, n = native.cc_label(m)
    want, wn = ndi.label(m, structure=_EIGHT)
    assert n == wn
    # label ids may differ in numbering; compare partitions
    np.testing.assert_array_equal(labels > 0, want > 0)
    mapping = {}
    for a, b in zip(labels.ravel(), want.ravel()):
        if a:
            assert mapping.setdefault(a, b) == b


def test_remove_small_objects_matches_scipy_based():
    m = _mask(3, p=0.35)
    got = native.remove_small_objects(m, 20)
    labels, n = ndi.label(m, structure=_EIGHT)
    sizes = np.bincount(labels.ravel())
    keep = sizes >= 20
    keep[0] = False
    np.testing.assert_array_equal(got, keep[labels])


@pytest.mark.parametrize("seed", [4, 5])
def test_dilation_erosion_match_scipy(seed):
    m = _mask(seed, p=0.3)
    st = disk(2)
    np.testing.assert_array_equal(native.binary_dilation(m, st), ndi.binary_dilation(m, structure=st))
    np.testing.assert_array_equal(
        native.binary_erosion(m, st, border_value=1), ndi.binary_erosion(m, structure=st, border_value=1)
    )


def test_region_props():
    labels = np.zeros((32, 32), np.int32)
    labels[2:6, 3:9] = 1  # 4x6 rect
    labels[20:30, 20:25] = 2  # 10x5 rect
    areas, centroids, bbox = native.region_props(labels, 2)
    np.testing.assert_array_equal(areas, [24, 50])
    np.testing.assert_allclose(centroids[0], [5.5, 3.5])  # (x, y)
    np.testing.assert_array_equal(bbox[0], [2, 3, 6, 9])
    np.testing.assert_array_equal(bbox[1], [20, 20, 30, 25])


@pytest.mark.parametrize("seed", [6, 7])
def test_otsu_matches_cv2(seed):
    import cv2

    rng = np.random.default_rng(seed)
    img = np.clip(np.where(rng.random((80, 80)) < 0.5, rng.normal(60, 15, (80, 80)),
                           rng.normal(190, 20, (80, 80))), 0, 255).astype(np.uint8)
    want, _ = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert native.otsu_threshold(img) == want


def test_morphology_ops_use_native_consistently():
    """ops.morphology native path == scipy path for get_rois/centroids."""
    from vit_ocm_wmsegmentation_tpu.ops import morphology as M

    rng = np.random.default_rng(8)
    img = np.zeros((64, 64), np.uint8)
    img[5:25, 5:25] = 255
    img[40:60, 35:58] = 255
    img[rng.integers(0, 64, 15), rng.integers(0, 64, 15)] = 255  # specks
    labels = M.get_rois(img)
    # scipy reference computation
    m = img > 0
    lab, n = ndi.label(m, structure=_EIGHT)
    sizes = np.bincount(lab.ravel())
    keep = sizes >= 20
    keep[0] = False
    m2 = keep[lab]
    st = disk(2)
    m2 = ndi.binary_erosion(ndi.binary_dilation(m2, st), st, border_value=1)
    want, wn = ndi.label(m2, structure=_EIGHT)
    assert labels.max() == wn
    np.testing.assert_array_equal(labels > 0, want > 0)
    pts = M.region_centroids(labels)
    assert len(pts) == wn


def test_native_lib_builds_from_source(tmp_path):
    """The ctypes loader builds libocm_native.so with make on first use."""
    import subprocess
    import sys

    code = (
        "import os, vit_ocm_wmsegmentation_tpu.native as n;"
        "os.path.exists(n._LIB_PATH) or None;"
        "print(n.available())"
    )
    # move the artifact aside (NOT delete: if the rebuild fails, a finally
    # puts it back — otherwise every later session silently skips the
    # whole native suite via the module skipif), then let a fresh
    # interpreter rebuild it
    import shutil

    import vit_ocm_wmsegmentation_tpu.native as native_mod

    so = native_mod._LIB_PATH
    backup = str(tmp_path / "libocm_native.so.bak")
    if os.path.exists(so):
        shutil.copy2(so, backup)
        os.remove(so)
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=300)
        assert r.returncode == 0 and "True" in r.stdout, r.stderr[-500:]
        assert os.path.exists(so)
    finally:
        if not os.path.exists(so) and os.path.exists(backup):
            shutil.copy2(backup, so)

