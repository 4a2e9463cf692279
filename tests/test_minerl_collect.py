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
