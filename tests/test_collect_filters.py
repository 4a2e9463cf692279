"""Trajectory filter + clean_data golden tests (main.py:1317-1327,
1361-1458)."""

import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.data.collect import begin_filter, clean_data, trunk_filter


def test_trunk_filter_drops_post_reward_window():
    """Frames within 35 steps AFTER a reward are dropped (crown
    chopping, main.py:1324-1327); the reward frame itself stays."""
    n = 100
    pov = np.arange(n)[:, None]
    reward = np.zeros(n)
    reward[40] = 1.0
    p2, r2 = trunk_filter(pov, reward)
    kept = p2[:, 0]
    assert 40 in kept                      # reward frame kept
    for t in range(41, 76):                # 35 following frames dropped
        assert t not in kept
    assert 76 in kept and 39 in kept


def test_trunk_filter_no_rewards_is_identity():
    pov = np.arange(50)[:, None]
    reward = np.zeros(50)
    p2, r2 = trunk_filter(pov, reward)
    assert len(p2) == 50


def test_begin_filter_prefix():
    pov = np.arange(100)[:, None]
    reward = np.zeros(100)
    reward[30] = 2.0
    res = begin_filter(pov, reward)
    assert res is not None
    p2, r2 = res
    assert len(p2) == 31 and r2[-1] == 2.0  # up to & incl. first reward


def test_begin_filter_skips_long_prefix():
    reward = np.zeros(2000)
    reward[1500] = 1.0
    assert begin_filter(np.zeros((2000, 1)), reward) is None


def test_clean_data_chunking(tmp_path, monkeypatch):
    """100-frame chunks ending 20 before each deduped chop; last 5
    frames relabeled as reward (main.py:1391-1414)."""
    monkeypatch.chdir(tmp_path)
    n = 1000
    x = np.arange(n, dtype=np.int64)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.int64)
    y = np.zeros((7, n), np.float32)
    i = np.arange(n, dtype=np.uint16)  # one long episode
    chops = [300, 320, 700]            # 320 within 100 of 300 -> deduped
    for c in chops:
        y[0, c] = 1.0

    cfg = Config(datasize=123)
    cx, cy, ci = clean_data(cfg, datadir=str(tmp_path) + "/",
                            x=x, y=y, i=i)
    # 2 clean chops (300, 700), each a 100-frame chunk -> 200 frames
    assert len(cx) == 200
    # chunk ends at chop-20 (shift), ascending within chunk
    assert cx[99, 0, 0, 0] == 300 - 20
    assert cx[199, 0, 0, 0] == 700 - 20
    # last 5 frames of each chunk relabeled 1 (main.py:1412-1413)
    assert cy[95:100].sum() == 5
    assert cy[:95].sum() == 0


def test_clean_data_cache_namespace_isolated(tmp_path, monkeypatch):
    """clean_data's cache must split the synthetic/real namespaces
    like collect_data's (same shadowing class, second cache site)."""
    import gzip
    import pickle

    from cgs_tpu.core.config import Config
    from cgs_tpu.data.collect import clean_data

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (400, 64, 64, 3), dtype=np.uint8)
    y = np.zeros((7, 400), np.float32)
    y[0, [150, 350]] = 1.0
    i = np.tile(np.arange(200, dtype=np.uint16), 2)

    d = tmp_path / "cleandir"
    d.mkdir()
    # a REAL-data cleaned cache at this datasize
    real = (x[:5], y[:, :5], i[:5])
    with gzip.GzipFile(d / "400-clean.pickle", "wb") as fp:
        pickle.dump(real, fp)

    cfg = Config(datasize=400, testsize=0, synthetic_data=True)
    xs, _, _ = clean_data(cfg, datadir=str(d) + "/", x=x, y=y, i=i)
    assert xs.shape[0] != 5, "synthetic run loaded the real clean cache"
    assert (d / "synthetic-400-clean.pickle").exists()
