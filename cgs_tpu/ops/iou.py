"""Intersection-over-union (reference main.py:1265-1270).

Device-side: we expose `iou_counts` returning (intersection, union)
partial sums so multi-chip eval reduces IoU with a single psum of two
scalars instead of gathering masks to host (SURVEY.md §5 "Distributed
communication backend").
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

Array = jnp.ndarray


def iou_counts(a: Array, b: Array):
    """Partial sums for IoU. a, b: boolean (or {0,1}) arrays.

    Host numpy inputs are reduced with numpy (milliseconds); anything
    device-resident stays jnp so the counts can feed a psum inside jit
    (multi-chip eval). Without this split, calling jnp ops on host
    arrays uploads ~20 MB per eval through remote-TPU links and pays
    several tiny-program dispatches."""
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        a = a.astype(bool)
        b = b.astype(bool)
        return np.sum(a & b), np.sum(a | b)
    a = a.astype(jnp.bool_)
    b = b.astype(jnp.bool_)
    inter = jnp.sum(a & b)
    union = jnp.sum(a | b)
    return inter, union


def iou(a: Array, b: Array) -> float:
    """IoU rounded to 3 decimals, parity with main.py:1265-1270.

    union=0 (both masks empty — e.g. folder eval's all-zero GT plus an
    empty predicted hard mask, main.py:917-918) returns 0.0 instead of
    the reference's ZeroDivisionError (SURVEY.md §7.3 quirk policy:
    reproduce behavior, not crashes)."""
    inter, union = iou_counts(a, b)
    return round(float(inter) / float(max(int(union), 1)), 3)
