"""Contrastive set extraction (reference main.py:238-312).

A no-grad critic sweep over the full train set splits frames into
positives (pred > --high-rew-thresh, default 0.7) and negatives
(pred < --low-rew-thresh, default 0.3); random samplers then draw
(K pos, K neg, 2K contrast-neg) index triples per step (K=32,
main.py:306-312).

TPU design: the sweep is a single jitted scan over device-resident
uint8 frames (the reference loops host batches of 128); only the
(N,) prediction vector returns to host for the dynamic-size split.
Sampling stays host-side (numpy, replace=True like np.random.choice)
and ships per-epoch int32 index stacks to the scanned trainer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.train.losses import ingest


@functools.partial(jax.jit, static_argnums=0)
def _sweep(critic, cparams, x_all, idx):
    """Jitted full-dataset critic sweep: (cparams, x_all u8 (N,...),
    idx (C, batch) int32 pre-padded) -> preds (C*batch,) — caller
    trims padding. Always deterministic: the reference sweeps with
    critic.eval() (main.py:240). critic (a hashable flax Module) is a
    static argument so repeated sweeps hit the jit cache instead of
    re-tracing a fresh closure per call."""

    def body(_, bidx):
        xb = ingest(jnp.take(x_all, bidx, axis=0))
        pred = critic.apply({"params": cparams}, xb,
                            deterministic=True)
        return 0, pred.squeeze(-1)

    _, preds = jax.lax.scan(body, 0, idx)
    return preds.reshape(-1)


def make_sweep_fn(critic) -> Callable:
    """Back-compat shim over the cached `_sweep` jit."""
    return functools.partial(_sweep, critic)


def critic_sweep(critic, cparams, x_dev, n: int,
                 batch: int = 4096) -> np.ndarray:
    """Run the sweep over n device-resident frames; returns host (n,)
    preds."""
    n_chunks = -(-n // batch)
    idx = np.arange(n_chunks * batch, dtype=np.int32)
    idx = np.minimum(idx, n - 1).reshape(n_chunks, batch)
    sweep = make_sweep_fn(critic)
    # idx stays host numpy (uncommitted): x_dev may live on a
    # multi-process global mesh, and a locally-committed jnp array
    # cannot mix with global operands in one jit
    preds = np.asarray(sweep(cparams, x_dev, idx))
    return preds[:n]


@dataclasses.dataclass
class ContrastiveSets:
    """Device-resident pos/neg frame banks + label rows."""
    xpos: jax.Array          # (P, 64, 64, 3) uint8
    ypos: jax.Array          # (P,) float32, row rewidx
    xneg: jax.Array          # (N, 64, 64, 3) uint8
    yneg: jax.Array          # (N,) float32
    preds: np.ndarray        # (total,) critic preds (host)
    pos_mask: np.ndarray
    neg_mask: np.ndarray

    @property
    def n_pos(self) -> int:
        return int(self.xpos.shape[0])

    @property
    def n_neg(self) -> int:
        return int(self.xneg.shape[0])


def extract_contrastive_sets(cfg, critic, cparams, x_dev, y_row,
                             rng: np.random.Generator,
                             min_count: int = 500) -> ContrastiveSets:
    """Sweep + threshold split (main.py:238-312). y_row: host (N,)
    labels at row rewidx. Raises AssertionError below min_count per
    side (parity with main.py:281)."""
    n = int(x_dev.shape[0])
    if cfg.critic or cfg.cload:
        preds = critic_sweep(critic, cparams, x_dev, n)
        pos = preds > cfg.high_rew_thresh
        neg = preds < cfg.low_rew_thresh
    else:
        # no critic -> random split (main.py:268-272)
        pos = rng.random(n) > 0.5
        neg = ~pos
        preds = pos.astype(np.float32)

    assert pos.sum() >= min_count and neg.sum() >= min_count, (
        f"contrastive split too small: {int(pos.sum())} pos / "
        f"{int(neg.sum())} neg (need >={min_count} each, main.py:281)")
    if cfg.critic or cfg.cload:
        assert preds[pos].mean() > cfg.high_rew_thresh  # main.py:302

    # host-numpy indices: uncommitted operands follow x_dev's
    # (possibly multi-process global) sharding; the Handler re-places
    # all four banks explicitly when meshed (replicate_tree routes
    # through host numpy for multi-process). The label rows go on
    # device here too — leaving them host numpy re-shipped them
    # through the tunnel on EVERY chunk dispatch of the masker phase
    pos_idx = np.nonzero(pos)[0].astype(np.int32)
    neg_idx = np.nonzero(neg)[0].astype(np.int32)
    take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    return ContrastiveSets(
        xpos=take(x_dev, pos_idx),
        ypos=jnp.asarray(y_row[pos], jnp.float32),
        xneg=take(x_dev, neg_idx),
        yneg=jnp.asarray(y_row[neg], jnp.float32),
        preds=preds, pos_mask=pos, neg_mask=neg,
    )


def sample_index_stacks(rng: np.random.Generator, n_pos: int,
                        n_neg: int, n_steps: int, k: int = 32,
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hidx (S,K), lidx (S,K), cidx (S,2K)) int32 with replacement
    (np.random.choice semantics, main.py:310-312)."""
    h = rng.integers(0, n_pos, (n_steps, k), dtype=np.int32)
    l = rng.integers(0, n_neg, (n_steps, k), dtype=np.int32)
    c = rng.integers(0, n_neg, (n_steps, 2 * k), dtype=np.int32)
    return h, l, c
