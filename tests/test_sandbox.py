"""Tests for the research-sandbox components (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.data.collect_variants import (
    dedupe_chops, discounted_variants, merge_negative_bank,
    reward_window_frames, split_chunks,
)
from cgs_tpu.models.critic import Critic
from cgs_tpu.sandbox import (
    dream, make_discriminator_step, make_td_critic_step, sarsa_pairs,
)
from cgs_tpu.train.steps import init_train_state, make_optimizer

KEY = jax.random.PRNGKey(0)


def _critic_state():
    critic = Critic(dropout=0.0)
    cp = critic.init({"params": KEY}, jnp.zeros((2, 64, 64, 3)),
                     collect=True)["params"]
    tx = make_optimizer()
    return critic, tx, init_train_state({"critic": cp}, tx)


def test_sarsa_pairs_respect_episode_boundaries():
    # two episodes of 10 frames each (I resets at 10)
    i = np.concatenate([np.arange(10), np.arange(10)]).astype(np.uint16)
    x = np.zeros((20, 4, 4, 3), np.uint8)
    y = np.zeros(20, np.float32)
    y[9] = 1.0
    t, tp, r = sarsa_pairs(x, y, i, fskip=3)
    assert (tp - t == 3).all()
    # no pair crosses the boundary at index 10
    assert not ((t < 10) & (tp >= 10)).any()
    assert r[t == 9].sum() == 0 or 9 not in t  # 9+3 crosses -> dropped


def test_td_critic_step_trains(rng):
    critic, tx, state = _critic_state()
    cfg = Config(shift=0, dropout=0.0)
    step = make_td_critic_step(cfg, critic, tx, etha=0.98)
    xt = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8))
    xtp = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8))
    r = jnp.zeros(8, jnp.float32)
    for i in range(3):
        state, loss = step(state, xt, xtp, r, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
    assert int(state.step) == 3


def test_discriminator_learns_two_banks(rng):
    critic, tx, state = _critic_state()
    step = make_discriminator_step(critic, tx)
    # bank A: dark frames; bank B: bright frames
    a = rng.integers(0, 60, (16, 64, 64, 3)).astype(np.uint8)
    b = rng.integers(180, 256, (16, 64, 64, 3)).astype(np.uint8)
    x = jnp.asarray(np.concatenate([a, b]))
    y = jnp.asarray(np.concatenate([np.zeros(16), np.ones(16)])
                    .astype(np.float32))
    losses = []
    for i in range(60):
        state, loss = step(state, x, y, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3


def test_dream_increases_pred(rng):
    critic, _, state = _critic_state()
    x0 = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    final, traj, preds = dream(critic, state.params["critic"], x0,
                               steps=32, lr=0.1)
    assert final.shape == x0.shape
    assert float(final.min()) >= 0.0 and float(final.max()) <= 1.0
    # ascent must not decrease the mean critic value
    assert float(preds[-1].mean()) >= float(preds[0].mean()) - 1e-5


def test_dedupe_chops():
    r = np.zeros(500)
    r[[10, 30, 200, 210, 400]] = 1
    out = dedupe_chops(r, min_delta=50)
    np.testing.assert_array_equal(out, [10, 200, 400])


def test_split_chunks():
    pov = np.arange(400)[:, None, None, None].repeat(2, 1)
    r = np.zeros(400)
    r[150] = 1
    pre, post = split_chunks(pov, r, chunklen=100)
    assert pre.shape[0] == post.shape[0] == 1
    assert pre[0, -1, 0, 0] == 150       # approach ends at the chop
    assert post[0, 0, 0, 0] == 151       # aftermath starts after it


def test_discounted_variants_semantics():
    r = np.zeros(50)
    r[[20, 49]] = 1
    sel, rows = discounted_variants(r, gamma=0.9)
    assert rows.shape[1] == 6
    # at each chop frame: fak resets to 1 (col 1)
    chop_rows = rows[np.isin(sel, [20, 49])]
    np.testing.assert_allclose(chop_rows[:, 1], 1.0)
    # addfak accumulates +1 per chop but decays between them
    # (TrainHandler.py:3060,3078): earlier chop sits on the residue of
    # the later one -> strictly above 1, later chop exactly 1
    assert 1.0 < rows[sel == 20, 2][0] < 2.0
    np.testing.assert_allclose(rows[sel == 49, 2], 1.0)
    # sub counts down monotonically between chops (col 5)
    mid = rows[(sel > 20) & (sel < 49)][:, 5]
    assert (np.diff(mid) > 0).all()  # ascending toward the chop


def test_reward_window_and_bank_merge():
    pov = np.arange(100)[:, None]
    r = np.zeros(100)
    r[50] = 1
    frames = reward_window_frames(pov, r, window=5)
    np.testing.assert_array_equal(frames[:, 0], np.arange(45, 56))
    x = np.zeros((10, 2, 2, 3), np.uint8)
    y = np.ones((7, 10), np.float32)
    nx = np.zeros((4, 2, 2, 3), np.uint8)
    mx, my = merge_negative_bank(x, y, nx)
    assert mx.shape[0] == 14 and my.shape == (7, 14)
    assert (my[:, 10:] == 0).all()


def test_rgb_to_hsv_matches_matplotlib():
    from matplotlib.colors import rgb_to_hsv as mpl_hsv

    from cgs_tpu.sandbox.cluster import rgb_to_hsv

    rng = np.random.default_rng(0)
    rgb = rng.random((32, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    theirs = mpl_hsv(rgb)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_kmeans_separates_blobs():
    from cgs_tpu.sandbox.cluster import kmeans

    rng = np.random.default_rng(1)
    a = rng.normal((0, 0), 0.05, (200, 2))
    b = rng.normal((1, 1), 0.05, (200, 2))
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    cents, labels = kmeans(pts, 2, iters=20)
    labels = np.asarray(labels)
    # each blob lands in exactly one cluster
    assert len(set(labels[:200])) == 1 and len(set(labels[200:])) == 1
    assert labels[0] != labels[200]


def test_cluster_frames_finds_tree_cluster(tmp_path):
    """Frames with a green box inside the hand treemask on reward
    frames: the green pixel cluster must be the argmax target
    (TrainHandler.py:2066-2110)."""
    from cgs_tpu.sandbox.cluster import (
        cluster_frames, default_treemask, save_cluster_layers,
        save_kmeans,
    )

    rng = np.random.default_rng(2)
    n = 12
    x = np.full((n, 64, 64, 3), 40, np.uint8)   # dark background
    x += rng.integers(0, 8, x.shape, dtype=np.uint8)
    y = np.zeros(n)
    y[:6] = 1
    # tree = bright green patch inside the box, only on reward frames
    x[:6, 24:40, 27:37] = (40, 220, 40)
    res = cluster_frames(x, y, n_clusters=3, seed=0)
    tree_label = res["labels"][0, 30, 30]       # inside the patch
    assert res["target"] == tree_label
    assert res["layers"].shape == (n, 3, 64, 64)
    assert res["values"].shape == (3,)
    assert default_treemask().sum() == 21 * 14

    save_kmeans(str(tmp_path / "kmeans.p"), res["centroids"],
                res["target"])
    save_cluster_layers(str(tmp_path / "train-3-cluster"),
                        res["layers"])
    import gzip as _gz
    import pickle as _pk
    cents, target = _pk.load(open(tmp_path / "kmeans.p", "rb"))
    assert target == res["target"] and cents.shape == (3, 2)
    with _gz.open(tmp_path / "train-3-cluster", "rb") as fp:
        layers = _pk.load(fp)
    assert layers.dtype == np.uint8 and layers.shape == res["layers"].shape


def test_sum_segm_loss_and_training():
    """sum_segm: soft-mask sums are pulled toward the (stop-grad)
    hard-mask counts with the 10-pixel floor
    (TrainHandler.py:1935-1939); a few steps reduce the loss."""
    from cgs_tpu.models.zoo import Unet
    from cgs_tpu.sandbox.sum_segm import sum_segm_loss, train_sum_segm

    m = jnp.full((2, 8, 8, 1), 0.2)
    # hard count = 0 -> floor 10; soft sum = 12.8 -> mse (12.8-10)^2
    np.testing.assert_allclose(float(sum_segm_loss(m)), (12.8 - 10) ** 2,
                               rtol=1e-5)

    unet = Unet()
    key = jax.random.PRNGKey(0)
    params = unet.init({"params": key},
                       jnp.zeros((2, 64, 64, 3)))["params"]
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (64, 64, 64, 3), dtype=np.uint8)
    params, losses = train_sum_segm(unet, params, x, steps=12,
                                    batch=8, rng=rng, chunk_steps=6)
    assert np.isfinite(losses).all()
    # the objective is self-referential (the hard-count target moves
    # with the mask), so it spikes off the fresh init before settling;
    # assert the post-transient tail descends
    assert np.mean(losses[-3:]) < np.mean(losses[2:5])


def test_dev_discount_rows_match_reference_recursion():
    """dev's six label variants (TrainHandler.py:3745-3762) against a
    hand-run of the reference's backward python loop."""
    from cgs_tpu.sandbox.dev import DEV_SPECS, dev_discount_row

    reward = np.zeros(12, np.float32)
    reward[[4, 9]] = 1.0

    for gamma, nonrew in DEV_SPECS:
        if nonrew:
            ref = ((reward <= 0) * nonrew).astype(np.float64)
            for i in range(2, len(ref) + 1):
                last = gamma * ref[-i + 1]
                cur = ref[-i]
                ref[-i] = 0 if cur == 0 else cur + last
        else:
            ref = reward.astype(np.float64).copy()
            for i in range(2, len(ref) + 1):
                ref[-i] = ref[-i] + gamma * ref[-i + 1]
        ours = dev_discount_row(reward, gamma, nonrew)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_dev_artifacts(tmp_path):
    import gzip as _gz
    import pickle as _pk

    from cgs_tpu.sandbox.dev import dev

    rng = np.random.default_rng(0)
    eps = [(rng.random(40) > 0.9).astype(np.float32) for _ in range(6)]
    p = str(tmp_path / "Treechop-100.pickle")
    png = str(tmp_path / "dev_hist.png")
    y = dev(eps, size=100, out_pickle=p, out_png=png)
    assert y.shape == (7, 100)
    assert (y[0] == 0).all()          # row 0 untouched (ref quirk)
    assert (y[4:7] <= 0).all()        # nonrew rows are penalties
    with _gz.open(p, "rb") as fp:
        y2 = _pk.load(fp)
    np.testing.assert_array_equal(y, y2)
    import os as _os
    assert _os.path.getsize(png) > 0


def test_multirun_aggregates_last_ious(tmp_path, monkeypatch):
    """run_seeds must read the per-run eval score (last_ious), not the
    never-updated reference tracker handler.ious."""
    from cgs_tpu.sandbox import multirun

    class FakeHandler:
        def __init__(self, seed):
            self.ious = (0.0, 0.0)          # reference tracker: stuck
            self.last_ious = [0.5 + seed / 10.0]
            self.closed = False

        def close(self):                    # part of the Handler API
            self.closed = True

    def fake_main(argv):
        seed = int(argv[argv.index("--seed") + 1])
        return FakeHandler(seed)

    import cgs_tpu.cli
    monkeypatch.setattr(cgs_tpu.cli, "main", fake_main)
    monkeypatch.chdir(tmp_path)
    out = multirun.run_seeds(["-train", "-eval"], runs=3)
    assert out["ious"] == [0.5, 0.6, 0.7]
    assert abs(out["mean"] - 0.6) < 1e-9
    assert "mean=0.600" in open(tmp_path / "results.txt").read()


def test_bench_width_training_smoke():
    """bench_width (the chfak-sweep perf tool, VERDICT r4 #1a) must
    build and time both training chunks at a non-default width without
    touching the network/device assumptions of bench.py. Tiny shapes:
    2 steps x 1 round on the CPU backend."""
    from cgs_tpu.sandbox import bench_width

    out = bench_width.bench_training(chfak=2, dropout=0.5, bf16=False,
                                     steps=2, rounds=1)
    metrics = {r["metric"]: r for r in out}
    assert set(metrics) == {"critic_train_steps_per_sec",
                            "masker_train_steps_per_sec"}
    for r in out:
        assert r["chfak"] == 2 and r["value"] > 0
    assert metrics["masker_train_steps_per_sec"]["fuse"] == "both"


def test_bench_width_pallas_upsample_passthrough():
    """--pallas-upsample-ab must reach the decoder: _models forwards
    the forced flag into UnetDecoder.use_pallas_upsample (None keeps
    the decoder's auto gate) and bench_inference tags its JSON line."""
    import jax.numpy as jnp

    from cgs_tpu.sandbox import bench_width

    for forced in (None, False, True):
        _, masker = bench_width._models(2, 0.5, jnp.float32,
                                        pallas_upsample=forced)
        assert masker.use_pallas_upsample is forced
