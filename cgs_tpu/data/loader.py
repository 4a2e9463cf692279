"""Host->device data staging.

Replaces the reference's torch DataLoader (main.py:125-129) with a
device-resident design: the uint8 dataset is uploaded to HBM once
(100k x 64x64x3 = 1.2 GB), and each epoch ships only shuffled int32
index stacks; batches are gathered on-device by the scanned trainers
(cgs_tpu/train/loops.py). On multi-host topologies the bundle is
sharded over the 'data' mesh axis by jax.device_put with a
NamedSharding.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DataBundle:
    """Train/test split per the reference contract (main.py:113-123):
    last `testsize` frames are held out; optional reward binarization
    at threshrew."""
    x_train: np.ndarray      # (N, 64, 64, 3) uint8 (host)
    y_train: np.ndarray      # (7, N) float32 (host)
    i_train: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray
    i_test: np.ndarray
    x_train_dev: Optional[jax.Array] = None   # device-resident u8
    y_train_dev: Optional[jax.Array] = None   # (N,) row rewidx

    @classmethod
    def from_arrays(cls, x, y, i, cfg) -> "DataBundle":
        ts = cfg.testsize
        xtr, ytr, itr = x[:-ts], y[:, :-ts], i[:-ts]
        xte, yte, ite = x[-ts:], y[:, -ts:], i[-ts:]
        if cfg.threshrew:  # main.py:120-122
            ytr = (ytr > cfg.threshrew).astype(np.float32)
            yte = (yte > cfg.threshrew).astype(np.float32)
        return cls(xtr, ytr, itr, xte, yte, ite)

    def to_device(self, cfg, sharding=None) -> "DataBundle":
        put = (lambda a: jax.device_put(a, sharding)) if sharding \
            else jnp.asarray
        self.x_train_dev = put(self.x_train)
        self.y_train_dev = put(
            self.y_train[cfg.rewidx].astype(np.float32))
        return self

    @property
    def n_train(self) -> int:
        return int(self.x_train.shape[0])


class EpochLoader:
    """Shuffled batch-index stacks, chunked at the viz cadence.

    Yields (C, S, B) slabs where C iterates chunks of S=visevery steps
    of batch B — one device program per chunk (train/loops.py)."""

    def __init__(self, n: int, batch: int, rng: np.random.Generator,
                 drop_last: bool = False):
        self.n = n
        self.batch = batch
        self.rng = rng
        self.drop_last = drop_last

    def epoch_steps(self) -> int:
        return self.n // self.batch if self.drop_last else \
            -(-self.n // self.batch)

    def epoch_indices(self) -> np.ndarray:
        """(steps, batch) int32; the ragged tail wraps around (the
        reference's DataLoader keeps partial batches — static shapes
        need the wrap; one epoch still touches every frame)."""
        perm = self.rng.permutation(self.n).astype(np.int32)
        steps = self.epoch_steps()
        total = steps * self.batch
        if total > self.n:
            # cyclic repeat handles n < batch too (a 30-frame dataset
            # with batch 64 wraps the permutation twice-plus)
            perm = np.resize(perm, total)
        return perm[:total].reshape(steps, self.batch)

    def chunks(self, chunk_steps: int) -> Iterator[np.ndarray]:
        idx = self.epoch_indices()
        for lo in range(0, idx.shape[0], chunk_steps):
            yield idx[lo:lo + chunk_steps]
