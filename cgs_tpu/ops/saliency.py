"""Input-gradient saliency baseline (reference main.py:949-953,976-998).

The reference computes |d mean(pred) / d X| summed over channels as the
"Saliency Map" baseline (paper IoU 0.22), then normalizes either by a
global mean (`-salglobal`, default) or per-frame top-k quantile, scales
by the critic pred and thresholds at `--salience-thresh`.

Here the gradient is a `jax.grad` of the critic apply — one fused XLA
backward program per batch — and both normalizations are pure device
functions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# main.py:992 adds sys.float_info.min — a float64 denormal that the
# reference's float64 numpy keeps nonzero. In float32 it underflows to
# 0.0, making the guard inert (0/0 = NaN saliency on ReLU-dead
# frames); float32's own smallest normal keeps the semantics.
_EPS = float(np.finfo(np.float32).tiny)


def saliency_map(critic_apply, params, batch: Array,
                 rngs=None) -> Array:
    """|grad of mean sigmoid pred wrt input|, summed over channels.

    batch: (B, H, W, C) float. Returns (B, H, W, 1).
    Parity: main.py:950-951 `pred.mean().backward(); batch.grad.abs()
    .sum(dim=1)`.
    """
    def mean_pred(x):
        out = critic_apply(params, x, rngs=rngs)
        pred = out[0] if isinstance(out, tuple) else out
        return jnp.mean(pred)

    g = jax.grad(mean_pred)(batch)
    return jnp.sum(jnp.abs(g), axis=-1, keepdims=True)


def normalize_saliency_global(sal: Array, preds: Array,
                              thresh: float):
    """Global-mean normalization (main.py:980-982,992-995).

    sal: (B, H, W, 1); preds: (B,). Returns (soft, hard) where hard is
    uint8 {0,1} thresholded at `thresh`. Host numpy inputs are
    normalized with numpy (jnp ops on host arrays would upload the
    ~38 MB eval saliency through remote-TPU links for a reduction the
    host does in milliseconds — same rule as ops/iou.py:iou_counts).
    """
    xp = np if isinstance(sal, np.ndarray) else jnp
    norm = xp.mean(sal * (sal >= 0)) * thresh
    sal = sal / (norm + _EPS)
    sal = sal * preds[:, None, None, None]
    sal = xp.where(sal >= 1.0, 1.0, sal)
    hard = (sal > thresh).astype(xp.uint8)
    return sal, hard


def normalize_saliency_topk(sal: Array, preds: Array, thresh: float):
    """Per-frame k-th order-statistic normalization (main.py:984-995).

    k = floor(H*W*thresh); each frame is divided by its k-th smallest
    saliency value (the reference sorts ascending and indexes [k]).
    """
    xp = np if isinstance(sal, np.ndarray) else jnp
    b, h, w, _ = sal.shape
    k = int(h * w * thresh)
    flat = sal.reshape(b, -1)
    norm = xp.sort(flat, axis=-1)[:, min(k, h * w - 1)]
    sal = sal / (norm[:, None, None, None] + _EPS)
    sal = sal * preds[:, None, None, None]
    sal = xp.where(sal >= 1.0, 1.0, sal)
    hard = (sal > thresh).astype(xp.uint8)
    return sal, hard
