"""MineRL collection path (_collect_minerl, data/collect.py) driven by
a fake `minerl` module — the real package isn't installed, so the
trajectory sweep, filter dispatch, size capping, Y-matrix layout and
cache writeout (reference main.py:1287-1350) otherwise only run in
production."""

import os
import sys
import types

import numpy as np
import pytest

from cgs_tpu.core.config import Config
from cgs_tpu.data.collect import (
    collect_data, label_episode, load_cache, trunk_filter,
)

FRAMES_PER_EP = 120


def _episode(seed, reward_at=()):
    """One fake trajectory: per-step (state, action, reward, next
    state, done) tuples, as minerl's load_data yields them."""
    rng = np.random.default_rng(seed)
    steps = []
    for t in range(FRAMES_PER_EP):
        pov = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        r = 1.0 if t in reward_at else 0.0
        steps.append(({"pov": pov, "vector": np.zeros(64)},
                      {"vector": np.zeros(64)}, r,
                      {"pov": pov, "vector": np.zeros(64)},
                      t == FRAMES_PER_EP - 1))
    return steps


class _FakeData:
    def __init__(self, episodes):
        self.episodes = episodes

    def get_trajectory_names(self):
        return sorted(self.episodes)

    def load_data(self, name):
        return iter(self.episodes[name])


@pytest.fixture
def fake_minerl(monkeypatch, tmp_path):
    """Install a fake `minerl` package and a data root that already
    'contains' the download, recording every call."""
    calls = {"download": [], "make": []}
    episodes = {
        "v3_ep0": _episode(0, reward_at=(30, 90)),
        "v3_ep1": _episode(1, reward_at=(50,)),
        "v3_ep2": _episode(2, reward_at=(10, 60, 100)),
    }

    fake = types.ModuleType("minerl")
    fake.data = types.SimpleNamespace(
        download=lambda root, experiment: calls["download"].append(
            (root, experiment)),
        make=lambda envid, data_dir, num_workers, worker_batch_size:
            (calls["make"].append((envid, num_workers,
                                   worker_batch_size))
             or _FakeData(episodes)),
    )
    monkeypatch.setitem(sys.modules, "minerl", fake)
    root = tmp_path / "mineroot"
    (root / "MineRLTreechopVectorObf-v0").mkdir(parents=True)
    monkeypatch.setenv("MINERL_DATA_ROOT", str(root))
    return calls, episodes, tmp_path


def _cfg(tmp_path, datamode="trunk", datasize=200, testsize=40):
    return Config(datamode=datamode, datasize=datasize,
                  testsize=testsize, model="fake").derive()


def test_trunk_collection_layout_and_cache(fake_minerl, tmp_path):
    calls, episodes, _ = fake_minerl
    cfg = _cfg(tmp_path)
    datadir = str(tmp_path / "cache") + "/"
    x, y, i = collect_data(cfg, datadir=datadir)

    # no download (the env dir exists); make called with the workers
    # tuple (main.py:1289-1290)
    assert calls["download"] == []
    assert calls["make"] == [("MineRLTreechopVectorObf-v0", 1, 1)]

    # trunk filter drops the 35 post-reward frames of each episode
    expected_n = 0
    for name in sorted(episodes):
        reward = np.asarray([s[2] for s in episodes[name]])
        pov = np.stack([s[0]["pov"] for s in episodes[name]])
        expected_n += trunk_filter(pov, reward)[0].shape[0]
    expected_n = min(expected_n, cfg.datasize + cfg.testsize)
    assert x.shape == (expected_n, 64, 64, 3) and x.dtype == np.uint8
    assert y.shape == (7, expected_n) and y.dtype == np.float32
    assert i.dtype == np.uint16

    # Y layout: row 0 binary reward, rows 1-4 the discount recursion
    first = trunk_filter(
        np.stack([s[0]["pov"] for s in episodes["v3_ep0"]]),
        np.asarray([s[2] for s in episodes["v3_ep0"]]))
    n0 = first[0].shape[0]
    expect_y = label_episode((first[1] > 0).astype(np.float32))
    np.testing.assert_allclose(y[:, :n0], expect_y, atol=1e-6)
    assert set(np.unique(y[0])) <= {0.0, 1.0}
    # frames match the filtered pov stream
    np.testing.assert_array_equal(x[:n0], first[0])

    # cache written with integrity sidecar; reload round-trips
    from cgs_tpu.data.collect import cache_path
    p = cache_path(datadir, cfg.envname, cfg.datamode, cfg.datasize,
                   cfg.gammas)
    assert os.path.exists(p) and os.path.exists(p + ".sha256")
    x2, y2, i2 = load_cache(p)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_allclose(y, y2)

    # second call must hit the cache, not minerl
    collect_data(cfg, datadir=datadir)
    assert len(calls["make"]) == 1


def test_size_capping_stops_sweep(fake_minerl, tmp_path):
    calls, _, _ = fake_minerl
    cfg = _cfg(tmp_path, datasize=50, testsize=10)
    x, y, i = collect_data(cfg, datadir=str(tmp_path / "cap") + "/")
    assert x.shape[0] == 60          # capped at datasize + testsize
    assert y.shape == (7, 60)


def test_begin_mode_keeps_prefix_only(fake_minerl, tmp_path):
    calls, episodes, _ = fake_minerl
    cfg = _cfg(tmp_path, datamode="begin")
    x, y, i = collect_data(cfg, datadir=str(tmp_path / "begin") + "/")
    # each episode contributes exactly first-reward-index + 1 frames
    # (main.py:1317-1323): rewards at 30, 50, 10 -> 31 + 51 + 11
    assert x.shape[0] == 31 + 51 + 11
    # final frame of each prefix carries the reward
    assert y[0, 30] == 1.0 and y[0, 31 + 50] == 1.0


def test_download_triggered_when_root_missing(fake_minerl, tmp_path,
                                              monkeypatch):
    calls, _, _ = fake_minerl
    monkeypatch.setenv("MINERL_DATA_ROOT",
                       str(tmp_path / "empty-root"))
    cfg = _cfg(tmp_path)
    collect_data(cfg, datadir=str(tmp_path / "dl") + "/")
    assert calls["download"] == [(str(tmp_path / "empty-root"),
                                  "MineRLTreechopVectorObf-v0")]


# -- realistic-shape fixtures (VERDICT r3 #6) -------------------------
# The happy-path fake above yields python-float rewards and tidy
# episodes; the real `minerl.data` surface differs in ways that have
# broken collectors before: numpy-scalar rewards/done flags, truncated
# recordings that yield ZERO steps (the reference's bare
# `zip(*load_data)` unpacking crashes, main.py:1310), and episodes
# longer than 65535 frames that silently WRAP the uint16 frame-index
# column I (main.py:1298 picked the dtype; clean_data's
# `deltas < 0` branch exists because of it).


def _realistic_episode(seed, n, reward_at=(), shared_pov=None):
    """Steps shaped as minerl 0.4's DataPipeline.load_data yields
    them: state/next-state dicts with 'pov' uint8 and 'vector'
    float32(64), np.float32 reward, np.bool_ done."""
    rng = np.random.default_rng(seed)
    pov = (shared_pov if shared_pov is not None
           else rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    vec = np.zeros(64, np.float32)
    steps = []
    rewset = set(reward_at)
    for t in range(n):
        r = np.float32(1.0 if t in rewset else 0.0)
        steps.append(({"pov": pov, "vector": vec}, {"vector": vec},
                      r, {"pov": pov, "vector": vec},
                      np.bool_(t == n - 1)))
    return steps


def _install_fake(monkeypatch, tmp_path, episodes):
    fake = types.ModuleType("minerl")
    fake.data = types.SimpleNamespace(
        download=lambda root, experiment: None,
        make=lambda envid, data_dir, num_workers, worker_batch_size:
            _FakeData(episodes))
    monkeypatch.setitem(sys.modules, "minerl", fake)
    root = tmp_path / "mineroot2"
    (root / "MineRLTreechopVectorObf-v0").mkdir(parents=True)
    monkeypatch.setenv("MINERL_DATA_ROOT", str(root))


def test_numpy_scalar_rewards_and_done(monkeypatch, tmp_path):
    """np.float32 rewards / np.bool_ done through the full sweep:
    binarization and the Y recursion must behave exactly as with
    python floats."""
    episodes = {"ep0": _realistic_episode(0, 120, reward_at=(30, 90))}
    _install_fake(monkeypatch, tmp_path, episodes)
    cfg = _cfg(tmp_path, datasize=100, testsize=20)
    x, y, i = collect_data(cfg, datadir=str(tmp_path / "np") + "/")
    assert y.dtype == np.float32
    assert set(np.unique(y[0])) <= {0.0, 1.0}
    assert y[0].sum() >= 1


def test_empty_trajectory_is_skipped_not_fatal(monkeypatch, tmp_path,
                                               capsys):
    """A truncated recording yields zero steps; the sweep must skip it
    and keep collecting (the reference's zip(*) unpacking would raise
    ValueError there — documented hardening divergence)."""
    episodes = {
        "ep0_empty": [],
        "ep1": _realistic_episode(1, 120, reward_at=(50,)),
    }
    _install_fake(monkeypatch, tmp_path, episodes)
    cfg = _cfg(tmp_path, datasize=60, testsize=20)
    x, y, i = collect_data(cfg, datadir=str(tmp_path / "mt") + "/")
    assert "skipping empty trajectory ep0_empty" in \
        capsys.readouterr().out
    assert x.shape[0] > 0


@pytest.mark.slow
def test_uint16_index_wraps_on_long_episodes(monkeypatch, tmp_path):
    """Episodes >65535 frames overflow the uint16 I column — the
    reference's dtype choice (main.py:1298) WRAPS the frame-in-episode
    index. Pin the wrap (I == arange % 2**16) so a future dtype or
    indexing change cannot silently alter cache semantics, and check
    clean_data's negative-delta dedupe branch still accepts chops
    across the wrap."""
    n = 70_000
    shared = np.zeros((64, 64, 3), np.uint8)  # aliased pov: the
    # episode is long, not image-diverse
    episodes = {"long": _realistic_episode(
        3, n, reward_at=(200, 65_000, 66_000, 69_500),
        shared_pov=shared)}
    _install_fake(monkeypatch, tmp_path, episodes)
    cfg = _cfg(tmp_path, datasize=68_000, testsize=1_000)
    x, y, i = collect_data(cfg, datadir=str(tmp_path / "long") + "/")

    kept = x.shape[0]
    assert kept > 66_000          # past the uint16 range
    assert i.dtype == np.uint16
    # trunk filter drops 35-post-reward windows, so the kept frames'
    # original indices are NOT arange — recompute the expectation
    from cgs_tpu.data.collect import trunk_filter
    reward = np.zeros(n, np.float32)
    reward[[200, 65_000, 66_000, 69_500]] = 1
    pov_idx = np.arange(n)
    mask_kept = trunk_filter(pov_idx[:, None], reward)[0][:, 0]
    expect = np.arange(len(mask_kept))[:kept].astype(np.uint16)
    np.testing.assert_array_equal(i, expect)
    assert i.max() == 65_535 and int(i[-1]) < 5_000  # wrapped

    # clean_data's wrap branch: deltas < 0 must be ACCEPTED chops
    from cgs_tpu.data.collect import clean_data
    xc, yc, ic = clean_data(cfg, x=x, y=y, i=i,
                            datadir=str(tmp_path / "long") + "/")
    assert xc.shape[0] > 0 and yc.sum() > 0
