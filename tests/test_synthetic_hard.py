"""The hard synthetic variant (VERDICT r3 #2): reward must be defined
by texture, not color, with color-matched distractors and a
nonstationary background — the fixture for the paper's ablation
ordering (docs/index.html results table).
"""

import numpy as np
import pytest

from cgs_tpu.data.synthetic import (
    synthetic_dataset, synthetic_episode_hard, synthetic_eval_set,
)


def test_contract_matches_collector():
    x, y, i = synthetic_dataset(1500, seed=3, variant="hard")
    assert x.shape == (1500, 64, 64, 3) and x.dtype == np.uint8
    assert y.shape == (7, 1500) and y.dtype == np.float32
    assert i.dtype == np.uint16
    assert set(np.unique(y[0])) <= {0.0, 1.0}
    assert y[0].sum() >= 1                      # rewards present
    # discounted rows span toward both thresholds (main.py:266-281
    # needs pred>0.7 and pred<0.3 populations to exist)
    assert (y[1] > 0.7).sum() > 30
    assert (y[1] < 0.3).sum() > 300


def test_gt_is_trunk_only_never_distractors():
    """Eval GT must exclude distractors — masking them costs IoU."""
    rng = np.random.default_rng(0)
    frames, rewards, masks = synthetic_episode_hard(rng, length=400)
    # reward frames have trunk GT; wander frames have none (even when
    # a distractor blob is visibly rendered)
    assert masks[rewards == 1].any(axis=(1, 2)).all()
    wander = ~masks.any(axis=(1, 2))
    assert wander.sum() > 100


def test_color_probes_cannot_separate_reward():
    """The easy fixture is linearly separable by color (the r3
    ablation inversion's root cause); the hard one must not be.
    Probes span MULTIPLE episodes (a color-only critic is one global
    function; within-episode separability behind a per-episode
    background is not exploitable), fit class-balanced least squares,
    and score BALANCED accuracy (labels are ~14/86 imbalanced):
      * per-frame channel means — must sit at chance;
      * full 48-bin color histograms (the strongest color-only
        family: catches palette-pixel AREA counting, which the
        per-frame area budget neutralizes) — must stay weak."""
    from cgs_tpu.data.synthetic import (
        synthetic_episode, synthetic_episode_hard,
    )

    def collect(ep):
        rng = np.random.default_rng(11)
        fs, ms = zip(*((f, m) for _ in range(8)
                       for f, _, m in [ep(rng, length=600)]))
        return np.concatenate(fs), np.concatenate(ms)

    def balanced_acc(feats, labels):
        y = labels.astype(np.float64)
        wts = np.where(labels, 0.5 / max(labels.sum(), 1),
                       0.5 / max((~labels).sum(), 1))
        feats = np.concatenate(
            [feats, np.ones((len(feats), 1))], axis=1)
        sw = np.sqrt(wts)[:, None]
        w, *_ = np.linalg.lstsq(feats * sw, y * sw[:, 0], rcond=None)
        pred = feats @ w > 0.5
        return (pred[labels].mean() + (~pred[~labels]).mean()) / 2

    def probes(ep):
        frames, masks = collect(ep)
        labels = masks.any(axis=(1, 2))
        means = frames.reshape(len(frames), -1, 3).mean(1) / 255.0
        hists = np.stack([
            np.stack([np.bincount(frames[i, :, :, c].ravel() // 16,
                                  minlength=16) for c in range(3)]
                     ).ravel() for i in range(len(frames))]) / 4096.0
        return (balanced_acc(means, labels),
                balanced_acc(hists, labels))

    e_mean, e_hist = probes(synthetic_episode)
    assert e_mean > 0.9 and e_hist > 0.9, (
        "easy fixture should be color-separable", e_mean, e_hist)
    h_mean, h_hist = probes(synthetic_episode_hard)
    assert h_mean < 0.6, (
        f"hard fixture separable by channel means ({h_mean:.3f})")
    assert h_hist < 0.7, (
        f"hard fixture separable by color histogram ({h_hist:.3f})")


def test_distractors_share_trunk_palette():
    """Mean RGB of distractor pixels ~= mean RGB of trunk pixels
    (within noise) — color-matched by construction."""
    rng = np.random.default_rng(5)
    frames, rewards, masks = synthetic_episode_hard(rng, length=1000)
    trunk_px = frames[masks]
    # distractor pixels: wander frames, object-palette red channel
    wander = ~masks.any(axis=(1, 2))
    wf = frames[wander]
    # identify blobs as pixels with r>g+40 (object palette signature)
    blob = wf[:, :, :, 0].astype(int) > wf[:, :, :, 1].astype(int) + 40
    assert blob.any()
    dist_px = wf[blob]
    t, d = trunk_px.mean(0).astype(float), dist_px.mean(0).astype(float)
    assert np.abs(t - d).max() < 25, (t, d)


def test_background_nonstationary_across_episodes():
    """Per-episode anchors: background means must differ across
    episodes far more than within a frame's noise."""
    means = []
    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        frames, _, masks = synthetic_episode_hard(rng, length=150)
        wander = ~masks.any(axis=(1, 2))
        means.append(frames[wander].mean(axis=(0, 1, 2)))
    spread = np.asarray(means).std(axis=0)
    assert spread.max() > 20, f"episode palettes too similar: {spread}"


def test_eval_set_variant_plumbs_through():
    xe, gte = synthetic_eval_set(300, seed=1, variant="easy")
    xh, gth = synthetic_eval_set(300, seed=1, variant="hard")
    assert xe.shape == xh.shape
    assert not np.array_equal(xe, xh)


def test_cache_namespace_distinct(tmp_path, monkeypatch):
    """easy/hard caches must not shadow each other (collect.py)."""
    from cgs_tpu.core.config import Config
    from cgs_tpu.data.collect import collect_data
    monkeypatch.chdir(tmp_path)
    cfg_e = Config(synthetic_data=True, datasize=600, testsize=100,
                   seed=0).derive()
    cfg_h = Config(synthetic_data=True, datasize=600, testsize=100,
                   seed=0, synthetic_variant="hard").derive()
    xe, *_ = collect_data(cfg_e)
    xh, *_ = collect_data(cfg_h)
    assert not np.array_equal(xe, xh)
    # both caches exist side by side and reload their own bytes
    xe2, *_ = collect_data(cfg_e)
    np.testing.assert_array_equal(xe, xe2)
