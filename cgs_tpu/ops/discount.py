"""Reward discounting as a device-side scan.

The reference computes, per trajectory and per gamma, a backward
recursion over binarized rewards (main.py:1336-1346):

    r[t] = min(r[t] + gamma * r[t+1], 1)        (t from T-2 down to 0)

Host Python there; here it is a `jax.lax.scan` in reverse — one XLA
program for all gammas at once, so labeling a 100k-frame dataset is a
single device launch instead of a Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def discount_rewards(reward: Array, gamma: float) -> Array:
    """Backward min-capped discounted return of a binary reward sequence.

    reward: (T,) float in {0,1}. Returns (T,) float, parity with
    main.py:1341-1344.
    """
    def step(carry, r):
        out = jnp.minimum(r + gamma * carry, 1.0)
        return out, out

    _, rev = jax.lax.scan(step, jnp.asarray(0.0, reward.dtype),
                          reward[::-1])
    return rev[::-1]


def build_label_matrix(reward: Array, gammas=(0.98, 0.97, 0.96, 0.95),
                       rows: int = 7) -> Array:
    """7-row label matrix of a trajectory (main.py:1296,1333-1346):
    row 0 = binarized raw reward, rows 1..len(gammas) = discounted
    variants, remaining rows zero (the reference allocates 7 and fills
    5)."""
    reward = (reward > 0).astype(jnp.float32)
    out = [reward]
    for g in gammas:
        out.append(discount_rewards(reward, float(g)))
    while len(out) < rows:
        out.append(jnp.zeros_like(reward))
    return jnp.stack(out, axis=0)
