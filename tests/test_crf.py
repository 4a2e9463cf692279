"""C++ denseCRF (native/densecrf) correctness tests."""

import os

import numpy as np
import pytest

try:
    from cgs_tpu.eval.crf import DenseCRF
    _crf = DenseCRF()
except Exception as e:  # toolchain missing -> skip, never fail CI
    _crf = None
    _err = str(e)

pytestmark = pytest.mark.skipif(
    _crf is None, reason=f"native densecrf unavailable")


def _scene(rng, h=64, w=64):
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = (40, 130, 60)
    img[16:48, 24:40] = (200, 60, 40)
    gt = np.zeros((h, w), bool)
    gt[16:48, 24:40] = True
    return img, gt


def _iou(a, b):
    return (a & b).sum() / (a | b).sum()


def test_crf_denoises_mask(rng):
    img, gt = _scene(rng)
    noisy = np.clip(gt * 0.75 + rng.normal(0, 0.22, gt.shape), 0, 1)
    refined = _crf(img[None], noisy[None].astype(np.float32))[0]
    assert refined.dtype == bool
    assert _iou(refined, gt) > _iou(noisy > 0.5, gt)
    assert _iou(refined, gt) > 0.95


def test_crf_two_class_fast_path_matches_generic(rng, monkeypatch):
    """The C==2 single-channel filtering shortcut (densecrf.cpp:
    filt(q1) = filt(ones) - filt(q0) by linearity) must reproduce the
    generic C-channel path's labels. The identity is exact only in
    real arithmetic — float rounding (q0+q1 == 1 to ~1 ulp, FP
    contraction under -march=native) can flip pixels whose converged
    posterior sits exactly on the decision boundary — so allow a
    vanishing fraction rather than bit-equality."""
    img, gt = _scene(rng)
    imgs = np.stack([img] * 3)
    masks = np.clip(
        gt[None] * 0.7 + rng.normal(0, 0.25, (3,) + gt.shape),
        0, 1).astype(np.float32)
    fast = _crf(imgs, masks)
    monkeypatch.setenv("CGS_CRF_GENERIC", "1")
    generic = _crf(imgs, masks)
    assert (fast != generic).mean() <= 1e-3

    # CGS_CRF_GENERIC=0 / empty must NOT force the generic path: the
    # fast path is deterministic, so a third run flag-off matches the
    # first bit-for-bit
    monkeypatch.setenv("CGS_CRF_GENERIC", "0")
    np.testing.assert_array_equal(_crf(imgs, masks), fast)


def test_crf_confident_mask_stable(rng):
    """A clean confident mask must survive refinement ~unchanged."""
    img, gt = _scene(rng)
    conf = gt.astype(np.float32) * 0.98 + 0.01
    refined = _crf(img[None], conf[None])[0]
    assert _iou(refined, gt) > 0.9


def test_crf_batch_and_skip(rng):
    img, gt = _scene(rng)
    noisy = np.clip(gt * 0.75 + rng.normal(0, 0.2, gt.shape), 0, 1)
    imgs = np.stack([img] * 4)
    masks = np.stack([noisy] * 4).astype(np.float32)
    from cgs_tpu.eval.crf import DenseCRF
    crf2 = DenseCRF(skip=2)
    out = crf2(imgs, masks)
    assert out.shape == (4, 64, 64)
    # skipped frames keep the soft-mask >= 1 semantics (main.py:1263)
    assert _iou(out[0], gt) > 0.9
    np.testing.assert_array_equal(out[1], masks[1] >= 1)


def test_crf_all_background(rng):
    img, _ = _scene(rng)
    flat = np.full((1, 64, 64), 0.02, np.float32)
    out = _crf(img[None], flat)
    assert out.sum() == 0


def test_crf_empty_batch():
    """A short eval folder can slice [100:5000:2] down to zero frames;
    MaskPipeline.run supports n==0, so the CRF must too instead of
    tripping the native n_frames<=0 guard (rc=1)."""
    out = _crf(np.zeros((0, 64, 64, 3), np.uint8),
               np.zeros((0, 64, 64), np.float32))
    assert out.shape == (0, 64, 64) and out.dtype == bool


def test_crf_grid_search(rng):
    from cgs_tpu.eval.crf import grid_search
    img, gt = _scene(rng)
    noisy = np.clip(gt * 0.75 + rng.normal(0, 0.2, gt.shape),
                    0, 1).astype(np.float32)
    imgs = np.stack([img] * 3)
    masks = np.stack([noisy] * 3)
    gts = np.stack([gt] * 3)
    results, best = grid_search(imgs, masks, gts,
                                w1=(22.0, 5.0), gamma=(1.8,),
                                iters=(5,))
    assert len(results) == 2
    # sorted ascending by IoU (main.py:1257-1260)
    assert results[0][1] <= results[1][1]
    assert best.shape == gts.shape
    assert _iou(best, gts) >= results[-1][1] - 1e-9


def test_crf_rescale_rescues_underconfident_masks(rng):
    """-crf_rescale: a correct-but-faint mask (peak < 0.5) collapses
    under plain CRF (unaries favor background everywhere); rescaling
    the per-frame peak to 0.9 recovers the object."""
    from cgs_tpu.eval.crf import DenseCRF
    img, gt = _scene(rng)
    faint = gt.astype(np.float32) * 0.35   # confident shape, low value
    plain = DenseCRF()(img[None], faint[None])[0]
    rescued = DenseCRF(rescale=True)(img[None], faint[None])[0]
    assert plain.sum() == 0                # collapses
    assert _iou(rescued, gt) > 0.9         # recovered
    # confident masks are untouched by the rescale (factor >= 1 only)
    conf = gt.astype(np.float32) * 0.95
    a = DenseCRF()(img[None], conf[None])[0]
    b = DenseCRF(rescale=True)(img[None], conf[None])[0]
    np.testing.assert_array_equal(a, b)


def test_native_permutohedral_scale_regression():
    """`make test` in native/densecrf asserts the lattice's effective
    Gaussian std is ~1.0 in feature units (the canonical
    sqrt(2/3)*(d+1) elevation factor) for both the spatial (d=2) and
    bilateral (d=5) kernels."""
    import subprocess
    r = subprocess.run(
        ["make", "-C",
         os.path.join(os.path.dirname(__file__), "..", "native",
                      "densecrf"), "test"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("OK") == 2, r.stdout
