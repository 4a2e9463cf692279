"""EpochLoader / DataBundle semantics."""

import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.data.loader import DataBundle, EpochLoader


def test_epoch_touches_every_frame():
    loader = EpochLoader(n=1000, batch=64, rng=np.random.default_rng(0))
    idx = loader.epoch_indices()
    assert idx.shape == (16, 64)          # ceil(1000/64)
    assert set(idx.ravel()) == set(range(1000))
    # static shapes: the ragged tail wraps (documented redesign of the
    # reference's partial final batch)
    counts = np.bincount(idx.ravel(), minlength=1000)
    assert counts.max() <= 2 and counts.min() == 1


def test_chunks_cover_epoch():
    loader = EpochLoader(n=500, batch=50, rng=np.random.default_rng(1))
    chunks = list(loader.chunks(4))
    assert sum(c.shape[0] for c in chunks) == 10
    assert chunks[0].shape == (4, 50)
    assert chunks[-1].shape == (2, 50)    # final partial chunk


def test_databundle_split_and_threshrew():
    x = np.zeros((100, 64, 64, 3), np.uint8)
    y = np.linspace(0, 1, 700, dtype=np.float32).reshape(7, 100)
    i = np.arange(100, dtype=np.uint16)
    cfg = Config(testsize=20, threshrew=0.5)
    d = DataBundle.from_arrays(x, y, i, cfg)
    assert d.x_train.shape[0] == 80 and d.x_test.shape[0] == 20
    assert set(np.unique(d.y_train)) <= {0.0, 1.0}   # binarized
    cfg2 = Config(testsize=20)
    d2 = DataBundle.from_arrays(x, y, i, cfg2)
    assert not set(np.unique(d2.y_train)) <= {0.0, 1.0}


def test_epoch_indices_dataset_smaller_than_batch():
    """n < batch must wrap cyclically, not crash (np.resize path);
    the reference trains any dataset size via a partial final batch."""
    from cgs_tpu.data.loader import EpochLoader

    loader = EpochLoader(30, 64, np.random.default_rng(0))
    idx = loader.epoch_indices()
    assert idx.shape == (1, 64)
    assert set(idx.ravel().tolist()) == set(range(30))
