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
