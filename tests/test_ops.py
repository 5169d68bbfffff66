"""Seg-op parity vs cv2 / scipy / sklearn oracles."""

import cv2
import numpy as np
import pytest
import scipy.ndimage as ndi
import jax.numpy as jnp
import torch

from vit_ocm_wmsegmentation_tpu.ops import threshold as TH
from vit_ocm_wmsegmentation_tpu.ops import filters, metrics, cluster, chan_vese, morphology


def _u8(shape, seed=0, bimodal=False):
    rng = np.random.default_rng(seed)
    if bimodal:
        a = rng.normal(60, 15, size=shape)
        b = rng.normal(190, 20, size=shape)
        pick = rng.random(shape) < 0.45
        return np.clip(np.where(pick, b, a), 0, 255).astype(np.uint8)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Otsu / Yen
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,bimodal", [(0, True), (1, False), (2, True), (3, False)])
def test_otsu_matches_cv2(seed, bimodal):
    img = _u8((96, 96), seed, bimodal)
    ret, th = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    mask, t = TH.otsu_binary_u8(jnp.asarray(img))
    assert float(t) == ret
    np.testing.assert_array_equal(np.asarray(mask), th)


def test_otsu_constant_image():
    img = np.full((16, 16), 77, np.uint8)
    ret, th = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    mask, t = TH.otsu_binary_u8(jnp.asarray(img))
    assert float(t) == ret
    np.testing.assert_array_equal(np.asarray(mask), th)


def _yen_oracle(img):
    """skimage.filters.threshold_yen transliterated for the test oracle
    (skimage itself is not installed in this image)."""
    lo, hi = int(img.min()), int(img.max())
    hist = np.bincount(img.ravel(), minlength=256)[lo : hi + 1].astype(np.float64)
    bins = np.arange(lo, hi + 1)
    pmf = hist / hist.sum()
    p1 = np.cumsum(pmf)
    p1_sq = np.cumsum(pmf**2)
    p2_sq = np.cumsum(pmf[::-1] ** 2)[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        crit = np.log(((p1_sq[:-1] * p2_sq[1:]) ** -1) * (p1[:-1] * (1.0 - p1[:-1])) ** 2)
    crit[~np.isfinite(crit)] = -np.inf
    return bins[np.argmax(crit)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_yen_matches_skimage_semantics(seed):
    img = _u8((64, 64), seed, bimodal=True)
    want = _yen_oracle(img)
    got = float(TH.yen_threshold_u8(jnp.asarray(img)))
    assert got == want


def test_yen_constant_image_returns_constant():
    """skimage's bins reduce to the single occupied value for a flat image;
    returning 0 would be wrong for any consumer of the threshold value."""
    assert float(TH.yen_threshold_u8(jnp.full((32, 32), 200, jnp.uint8))) == 200.0


def test_yen_restricted_range():
    img = np.clip(_u8((64, 64), 5, bimodal=True), 40, 200)
    assert float(TH.yen_threshold_u8(jnp.asarray(img))) == _yen_oracle(img)


# ---------------------------------------------------------------------------
# threshold() blend parity: full uint8 quantization chain vs a numpy oracle
# ---------------------------------------------------------------------------


def _threshold_oracle(img_u8, attention):
    """utils.py:62-115 transliterated with numpy + cv2 (the test oracle)."""
    a = attention.astype(np.float32)  # reference attention arrives as float32
    if a.max() != a.min():
        a = (a - a.min()) / (a.max() - a.min())
    a8 = (a * np.float32(255)).astype(np.uint8)
    # blend itself runs in float64 in the reference (numpy uint8 true division)
    result = ((img_u8 / 2) * 0.6 + (a8 / 2) * 0.4).astype(np.uint8)
    _, th = cv2.threshold(result, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t2 = cv2.threshold(img_u8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)[0]
    th2 = ((img_u8 > t2).astype(np.uint8)) * 255
    _, th3 = cv2.threshold(a8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    return th, th2, th3


def test_threshold_ours_matches_reference_chain():
    img = _u8((96, 96), 7, bimodal=True)
    rng = np.random.default_rng(8)
    attn = rng.random((96, 96)).astype(np.float32) * 0.003  # raw attention scale
    w_th, w_th2, w_th3 = _threshold_oracle(img, attn)
    g_th, g_th2, g_th3 = TH.threshold_ours(jnp.asarray(img), jnp.asarray(attn))
    np.testing.assert_array_equal(np.asarray(g_th), w_th)
    np.testing.assert_array_equal(np.asarray(g_th2), w_th2)
    np.testing.assert_array_equal(np.asarray(g_th3), w_th3)


# ---------------------------------------------------------------------------
# median filter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("size", [1, 3, 5, 10])
def test_median_filter_matches_scipy(size):
    x = _u8((40, 40), 9).astype(np.float32)
    want = ndi.median_filter(x, size=size)
    got = np.asarray(filters.median_filter(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_metrics_match_sklearn():
    from sklearn.metrics import accuracy_score, f1_score, jaccard_score, precision_score, recall_score

    rng = np.random.default_rng(10)
    y_true = (rng.random(500) > 0.6).astype(np.uint8)
    y_pred = (rng.random(500) > 0.5).astype(np.uint8)
    got = np.asarray(metrics.calculate_metrics(jnp.asarray(y_true), jnp.asarray(y_pred)))
    want = [
        jaccard_score(y_true, y_pred),
        f1_score(y_true, y_pred),
        recall_score(y_true, y_pred),
        precision_score(y_true, y_pred),
        accuracy_score(y_true, y_pred),
    ]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dice_loss_matches_torch_reference():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    t = (rng.random((1, 1, 16, 16)) > 0.5).astype(np.float32)
    tx, tt = torch.from_numpy(x), torch.from_numpy(t)
    inputs = torch.sigmoid(tx).view(-1)
    targets = tt.view(-1)
    inter = (inputs * targets).sum()
    want = 1 - (2 * inter + 1) / (inputs.sum() + targets.sum() + 1)
    got = float(metrics.dice_loss(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, float(want), atol=1e-6)


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(12)
    y = (rng.random(400) > 0.5).astype(np.float32)
    s = np.round(np.clip(rng.random(400) + 0.3 * y, 0, 1) * 255) / 255
    got = float(metrics.roc_auc(jnp.asarray(y), jnp.asarray(s.astype(np.float32))))
    np.testing.assert_allclose(got, roc_auc_score(y, s), atol=1e-6)


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans2_partition_matches_cv2():
    img = _u8((96, 96), 13, bimodal=True)  # 96*96 divisible by 3, like 384*384
    pts = img.reshape(-1, 3).astype(np.float32)
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0)
    _, lab_cv, centers_cv = cv2.kmeans(pts, 2, None, criteria, 10, cv2.KMEANS_RANDOM_CENTERS)
    lab, centers = cluster.kmeans2(jnp.asarray(pts))
    lab, lab_cv = np.asarray(lab), lab_cv.ravel()
    agree = max((lab == lab_cv).mean(), (lab == 1 - lab_cv).mean())
    assert agree > 0.995
    got_c = np.sort(np.asarray(centers).mean(axis=1))
    want_c = np.sort(centers_cv.mean(axis=1))
    np.testing.assert_allclose(got_c, want_c, rtol=0.05)


def test_kmeans_feature_matches_sklearn_partition():
    from sklearn.cluster import KMeans

    rng = np.random.default_rng(14)
    a = rng.normal(0, 1, size=(300, 16))
    b = rng.normal(3, 1, size=(300, 16))
    feats = np.concatenate([a, b]).astype(np.float32).reshape(30, 20, 16)
    flat = feats.reshape(-1, 16)
    zs = (flat - flat.mean(0)) / flat.std(0, ddof=1)
    want = KMeans(n_init=10, n_clusters=2, random_state=0).fit(zs).labels_.reshape(30, 20)
    got = np.asarray(cluster.kmeans_feature_mask(jnp.asarray(feats))) // 255
    agree = max((got == want).mean(), (got == 1 - want).mean())
    assert agree > 0.995


def test_kmeans_feature_polarity_is_unsupervised_bright_foreground():
    """With gray_u8 given, the cluster whose pixels are brighter must come
    out as 255 regardless of which label Lloyd assigned it — the documented
    replacement for the reference's arbitrary sklearn polarity. No label is
    consulted (the function has no label argument at all)."""
    rng = np.random.default_rng(21)
    feats = np.zeros((20, 20, 8), np.float32)
    feats[:, :10] = rng.normal(0, 0.1, (20, 10, 8)) + 2.0
    feats[:, 10:] = rng.normal(0, 0.1, (20, 10, 8)) - 2.0
    gray = np.zeros((20, 20), np.uint8)
    gray[:, :10] = 220  # left half bright -> must be foreground
    out = np.asarray(cluster.kmeans_feature_mask(jnp.asarray(feats), jnp.asarray(gray)))
    assert (out[:, :10] == 255).all() and (out[:, 10:] == 0).all()
    # flip which side is bright: polarity must follow the image, feats fixed
    out2 = np.asarray(cluster.kmeans_feature_mask(jnp.asarray(feats), jnp.asarray(255 - gray)))
    assert (out2[:, :10] == 0).all() and (out2[:, 10:] == 255).all()


# ---------------------------------------------------------------------------
# chan-vese (behavioral: no skimage in this image)
# ---------------------------------------------------------------------------


def test_chan_vese_segments_two_regions():
    img = np.full((64, 64), 40, np.uint8)
    img[16:48, 16:48] = 210
    img = (img + np.random.default_rng(15).normal(0, 5, img.shape)).clip(0, 255).astype(np.uint8)
    seg = np.asarray(chan_vese.chan_vese(jnp.asarray(img)))
    inside = seg[20:44, 20:44].mean()
    border = np.concatenate([seg[:8].ravel(), seg[-8:].ravel()]).mean()
    assert inside > 0.95 and border < 0.05


def _skimage_chan_vese_oracle(image, mu=0.25, lambda1=1.0, lambda2=1.0,
                              tol=1e-3, max_num_iter=200, dt=0.5):
    """Transliterated skimage.segmentation.chan_vese (float64 numpy; the
    library is not installed in this image). Mirrors _cv_calculate_variation
    incl. _cv_delta(x, eps=1) = eps/(eps^2+x^2) — no 1/pi prefactor."""
    img = image.astype(np.float64)
    img = img - img.min()
    if img.max() != 0:
        img = img / img.max()
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    phi = np.sin(np.pi / 5 * yy) * np.sin(np.pi / 5 * xx)
    eta = 1e-16
    i, phivar = 0, np.inf
    while phivar > tol and i < max_num_iter:
        p = np.pad(phi, 1, mode="edge")
        phixp = p[1:-1, 2:] - p[1:-1, 1:-1]
        phixn = p[1:-1, 1:-1] - p[1:-1, :-2]
        phix0 = (p[1:-1, 2:] - p[1:-1, :-2]) / 2.0
        phiyp = p[2:, 1:-1] - p[1:-1, 1:-1]
        phiyn = p[1:-1, 1:-1] - p[:-2, 1:-1]
        phiy0 = (p[2:, 1:-1] - p[:-2, 1:-1]) / 2.0
        c1c = 1.0 / np.sqrt(eta + phixp**2 + phiy0**2)
        c2c = 1.0 / np.sqrt(eta + phixn**2 + phiy0**2)
        c3c = 1.0 / np.sqrt(eta + phix0**2 + phiyp**2)
        c4c = 1.0 / np.sqrt(eta + phix0**2 + phiyn**2)
        k = (p[1:-1, 2:] * c1c + p[1:-1, :-2] * c2c
             + p[2:, 1:-1] * c3c + p[:-2, 1:-1] * c4c)
        inside = phi > 0
        c1 = img[inside].mean() if inside.any() else 0.0
        c2 = img[~inside].mean() if (~inside).any() else 0.0
        delta = dt / (1.0 + phi**2)
        diff = -lambda1 * (img - c1) ** 2 + lambda2 * (img - c2) ** 2
        new_phi = (phi + delta * (mu * k + diff)) / (
            1.0 + mu * delta * (c1c + c2c + c3c + c4c))
        phivar = np.sqrt(((new_phi - phi) ** 2).mean())
        phi = new_phi
        i += 1
    return phi > 0


@pytest.mark.parametrize("shape,seed,bimodal",
                         [((48, 48), 15, True), ((48, 48), 4, False),
                          ((40, 56), 7, True)])  # non-square guards h/w mixups
def test_chan_vese_matches_skimage_oracle(shape, seed, bimodal):
    img = _u8(shape, seed, bimodal)
    got = np.asarray(chan_vese.chan_vese(jnp.asarray(img)))
    want = _skimage_chan_vese_oracle(img)
    # f32 device vs f64 oracle: border (phi~0) pixels may flip, and the
    # tol stop can fire one iteration apart between precisions — ~99%
    # pixel agreement is the expected envelope (a real structural bug,
    # e.g. a transposed axis or the old pi-scaled Dirac, lands far below)
    assert (got == want).mean() > 0.99, (got == want).mean()


def test_chan_vese_checkerboard_init_matches_skimage_formula():
    got = np.asarray(chan_vese.checkerboard_level_set((7, 9)))
    yy, xx = np.mgrid[0:7, 0:9]
    want = np.sin(np.pi / 5 * yy) * np.sin(np.pi / 5 * xx)
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# morphology
# ---------------------------------------------------------------------------


def test_disk_structuring_element():
    d = morphology.disk(2)
    assert d.sum() == 13 and d.shape == (5, 5) and not d[0, 0] and d[0, 2]


def test_remove_small_objects():
    mask = np.zeros((32, 32), bool)
    mask[2:4, 2:4] = True  # 4 px -> removed
    mask[10:17, 10:17] = True  # 49 px -> kept
    out = morphology.remove_small_objects(mask, min_size=20)
    assert not out[2, 2] and out[12, 12]


def test_jnp_closing_matches_scipy():
    rng = np.random.default_rng(16)
    mask = rng.random((48, 48)) > 0.6
    st = morphology.disk(2)
    want = ndi.binary_erosion(ndi.binary_dilation(mask, st), st, border_value=1)
    got = np.asarray(morphology.binary_closing(jnp.asarray(mask), st))
    np.testing.assert_array_equal(got, want)


def test_get_rois_and_centroids():
    mask = np.zeros((64, 64), np.uint8)
    mask[5:15, 5:15] = 255
    mask[40:60, 30:50] = 255
    labels = morphology.get_rois(mask)
    assert labels.max() == 2
    pts = morphology.region_centroids(labels)
    assert len(pts) == 2
    np.testing.assert_allclose(pts[0], (9.5, 9.5), atol=0.6)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,shape", [(0, (64, 64)), (1, (128, 96))])
def test_clahe_matches_cv2(seed, shape):
    """cv2.createCLAHE(2.0, (8,8)) parity; cv2 interpolates the tile LUTs in
    fixed-point, so up to +-1 level on a small pixel fraction is expected."""
    from vit_ocm_wmsegmentation_tpu.ops.clahe import clahe

    rng = np.random.default_rng(seed)
    img = np.clip(rng.normal(120, 50, shape), 0, 255).astype(np.uint8)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    got = np.asarray(clahe(jnp.asarray(img)))
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1
    assert (d == 0).mean() > 0.98


# ---------------------------------------------------------------------------
# normalizers (utils.py:426-449)
# ---------------------------------------------------------------------------


def test_normalizers_match_reference_formulas():
    from vit_ocm_wmsegmentation_tpu.ops import normalize as NM

    rng = np.random.default_rng(20)
    x = rng.normal(0, 2, (6, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(NM.l1_normalize(jnp.asarray(x))),
                               x / (np.abs(x).sum() + 1e-8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(NM.l2_normalize(jnp.asarray(x))),
                               x / np.sqrt((x**2).sum()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(NM.zscore_normalize(jnp.asarray(x))),
                               (x - x.mean()) / x.std(), rtol=1e-4, atol=1e-6)
    sm = np.asarray(NM.softmax_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(sm.sum(axis=1), 1.0, atol=1e-6)
    # zero-input passthrough guards
    z = jnp.zeros((3, 3))
    np.testing.assert_array_equal(np.asarray(NM.l2_normalize(z)), np.zeros((3, 3)))
    np.testing.assert_array_equal(np.asarray(NM.zscore_normalize(z)), np.zeros((3, 3)))


@pytest.mark.parametrize("trial", range(3))
def test_otsu_fuzz_bit_exact(trial):
    """Bit-exactness vs cv2 across many random histogram shapes: uniform,
    bimodal, constant-ish, spike-heavy."""
    rng = np.random.default_rng(100 + trial)
    for _ in range(25):
        kind = rng.integers(0, 4)
        if kind == 0:
            img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        elif kind == 1:
            img = np.clip(np.where(rng.random((32, 32)) < rng.random(),
                                   rng.normal(rng.integers(20, 100), 10, (32, 32)),
                                   rng.normal(rng.integers(120, 240), 15, (32, 32))), 0, 255).astype(np.uint8)
        elif kind == 2:
            img = np.full((32, 32), rng.integers(0, 256), np.uint8)
            img[rng.integers(0, 32, 5), rng.integers(0, 32, 5)] = rng.integers(0, 256)
        else:
            img = (rng.integers(0, 3, (32, 32)) * rng.integers(1, 120)).astype(np.uint8)
        want_t, want_m = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        got_m, got_t = TH.otsu_binary_u8(jnp.asarray(img))
        assert float(got_t) == want_t, (trial, kind, want_t, float(got_t))
        np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_blend_fuzz_bit_exact():
    """The uint8 blend LUT equals the reference float64 chain everywhere."""
    rng = np.random.default_rng(200)
    for _ in range(10):
        img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        attn = (rng.random((24, 24)).astype(np.float32) * rng.uniform(1e-4, 10))
        w_th, w_th2, w_th3 = _threshold_oracle(img, attn)
        g_th, g_th2, g_th3 = TH.threshold_ours(jnp.asarray(img), jnp.asarray(attn))
        np.testing.assert_array_equal(np.asarray(g_th), w_th)
        np.testing.assert_array_equal(np.asarray(g_th2), w_th2)
        np.testing.assert_array_equal(np.asarray(g_th3), w_th3)
