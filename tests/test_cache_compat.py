"""Dataset-cache compatibility: the gzip-pickle (X, Y, I) format and
filename scheme must round-trip and match the reference's layout
(main.py:1277-1284,1352-1354) so upstream caches drop in."""

import gzip
import os
import pickle

import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.data.collect import cache_path, collect_data, load_cache, save_cache


def _triple(n=50):
    x = np.random.default_rng(0).integers(
        0, 255, (n, 64, 64, 3), dtype=np.uint8)
    y = np.random.default_rng(1).random((7, n)).astype(np.float32)
    i = np.arange(n, dtype=np.uint16)
    return x, y, i


def test_cache_filename_scheme(tmp_path):
    p = cache_path(str(tmp_path), "Treechop", "trunk", 100000,
                   "0.98-0.97-0.96-0.95")
    assert p.endswith(
        "Treechop-trunk-100000-[0.98-0.97-0.96-0.95].pickle")


def test_cache_roundtrip(tmp_path):
    x, y, i = _triple()
    p = str(tmp_path / "cache.pickle")
    save_cache(p, x, y, i)
    x2, y2, i2 = load_cache(p)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    np.testing.assert_array_equal(i, i2)


def test_reference_written_cache_loads(tmp_path, monkeypatch):
    """A cache written the way the REFERENCE writes it (raw
    gzip.GzipFile + pickle.dump of the tuple, main.py:1352-1354) must
    be picked up by collect_data without touching MineRL."""
    monkeypatch.chdir(tmp_path)
    cfg = Config(datasize=40, testsize=10)
    x, y, i = _triple(50)
    p = cache_path("runs/data/straight/", cfg.envname, cfg.datamode,
                   cfg.datasize, cfg.gammas)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with gzip.GzipFile(p, "wb") as fp:
        pickle.dump((x, y, i), fp)

    x2, y2, i2 = collect_data(cfg)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_collect_without_cache_or_minerl_uses_synthetic(tmp_path,
                                                        monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config(datasize=200, testsize=50, synthetic_data=True)
    x, y, i = collect_data(cfg)
    assert x.shape == (250, 64, 64, 3) and y.shape == (7, 250)
    # second call hits the cache it just wrote
    x2, _, _ = collect_data(cfg)
    np.testing.assert_array_equal(x, x2)


def test_cache_integrity_hash(tmp_path):
    """Corrupted caches are detected via the sha256 sidecar; caches
    without a sidecar (reference-written) load unchecked."""
    import pytest as _pytest
    x, y, i = _triple()
    p = str(tmp_path / "c.pickle")
    save_cache(p, x, y, i)
    assert os.path.exists(p + ".sha256")
    load_cache(p)  # intact -> fine
    with open(p, "r+b") as fp:
        fp.seek(100)
        fp.write(b"\x00\x01\x02")
    with _pytest.raises(RuntimeError, match="corrupted"):
        load_cache(p)
    os.remove(p + ".sha256")  # no sidecar -> loads (maybe garbage,
    # but reference-format compatibility preserved)


def test_synthetic_cache_namespace_isolated(tmp_path, monkeypatch):
    """A -synthetic_data run must NOT shadow (or be shadowed by) the
    reference-format cache for the same envname/datasize/gammas."""
    monkeypatch.chdir(tmp_path)
    cfg_real = Config(datasize=40, testsize=10)
    x, y, i = _triple(50)
    p = cache_path("runs/data/straight/", cfg_real.envname,
                   cfg_real.datamode, cfg_real.datasize,
                   cfg_real.gammas)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with gzip.GzipFile(p, "wb") as fp:
        pickle.dump((x, y, i), fp)

    cfg_syn = Config(datasize=40, testsize=10, synthetic_data=True)
    xs, ys, _ = collect_data(cfg_syn)
    assert not np.array_equal(xs, x), \
        "synthetic run loaded the real-data cache"
    # and the real-data cache is still served to non-synthetic runs
    x2, _, _ = collect_data(cfg_real)
    np.testing.assert_array_equal(x2, x)


def test_synthetic_labels_honor_gammas(tmp_path, monkeypatch):
    """--gammas reaches the synthetic label matrix (rows 1-4) like it
    does the MineRL collector (collect.py:150)."""
    monkeypatch.chdir(tmp_path)
    base = dict(datasize=300, testsize=0, synthetic_data=True)
    _, y_default, _ = collect_data(Config(**base))
    monkeypatch.chdir(tmp_path / "..")  # fresh cwd -> fresh cache dir
    d2 = tmp_path.parent / "g2"
    d2.mkdir(exist_ok=True)
    monkeypatch.chdir(d2)
    _, y_custom, _ = collect_data(
        Config(**base, gammas="0.5-0.4-0.3-0.2"))
    # row 0 (binary reward) identical; discounted rows differ
    np.testing.assert_array_equal(y_default[0], y_custom[0])
    assert not np.allclose(y_default[1], y_custom[1])
    # gamma=0.5 decays faster than 0.98 -> strictly smaller mean
    assert y_custom[1].mean() < y_default[1].mean()


def test_synthetic_reward_on_final_approach_frame():
    """Every reward=1 frame is the LAST trunk-visible frame of its
    approach (next frame trunkless or episode end) — including
    truncated approaches at the episode tail."""
    from cgs_tpu.data.synthetic import synthetic_episode
    rng = np.random.default_rng(123)
    for _ in range(5):
        frames, rewards, masks = synthetic_episode(rng, length=600)
        has_trunk = masks.any(axis=(1, 2))
        fired = np.nonzero(rewards)[0]
        assert fired.size, "episode produced no reward"
        for t in fired:
            assert has_trunk[t], "reward on a trunkless frame"
            if t + 1 < len(rewards):
                assert not has_trunk[t + 1], \
                    "trunk survived past its reward frame"
        # every approach ends in a reward: count trunk segments
        starts = np.nonzero(has_trunk[1:] & ~has_trunk[:-1])[0] + 1
        if has_trunk[0]:
            starts = np.concatenate([[0], starts])
        assert len(fired) == len(starts)
