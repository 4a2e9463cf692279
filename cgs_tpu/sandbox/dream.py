"""Gradient-ascent input optimization against the critic (reference
`dream`, TrainHandler.py:1522-1590): iteratively nudge frames toward
higher predicted value — a what-does-the-critic-want visualization.

TPU design: the whole ascent loop is ONE `lax.scan` program (the
reference re-dispatches per step)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def dream(critic, cparams, x0: Array, steps: int = 64,
          lr: float = 0.05, clip: bool = True,
          collect_every: int = 8):
    """x0: (B, H, W, 3) float in [0,1]. Returns (final frames,
    trajectory (steps//collect_every, B, H, W, 3), preds (steps,B))."""

    def pred_mean(x):
        p = critic.apply({"params": cparams}, x).squeeze(-1)
        return jnp.mean(p), p

    grad_fn = jax.grad(pred_mean, has_aux=True)

    def body(x, _):
        g, p = grad_fn(x)
        x = x + lr * g / (jnp.abs(g).max() + 1e-12)
        if clip:
            x = jnp.clip(x, 0.0, 1.0)
        return x, (x, p)

    final, (traj, preds) = jax.lax.scan(body, x0, None, length=steps)
    return final, traj[::collect_every], preds
