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
    trajectory (ceil(steps/collect_every), B, H, W, 3) — the frame
    state after each collect_every-step chunk — and preds (steps, B)).

    The scan nests: an inner collect_every-step loop emits only preds,
    an outer loop stacks one frame snapshot per chunk — so the device
    trajectory buffer is steps/collect_every frames, not the full
    steps-long stack a flat scan would allocate and the host would
    immediately [::collect_every] away (at 512 steps x 256 frames
    that flat buffer alone is ~13 GB)."""

    def pred_mean(x):
        p = critic.apply({"params": cparams}, x).squeeze(-1)
        return jnp.mean(p), p

    grad_fn = jax.grad(pred_mean, has_aux=True)

    def ascend(x, _):
        g, p = grad_fn(x)
        x = x + lr * g / (jnp.abs(g).max() + 1e-12)
        if clip:
            x = jnp.clip(x, 0.0, 1.0)
        return x, p

    def chunk(x, _):
        x, p = jax.lax.scan(ascend, x, None, length=collect_every)
        return x, (x, p)

    n_full, rem = divmod(steps, collect_every)
    final, (traj, preds) = jax.lax.scan(chunk, x0, None,
                                        length=n_full)
    preds = preds.reshape(-1, x0.shape[0])
    if rem:
        final, tail = jax.lax.scan(ascend, final, None, length=rem)
        preds = jnp.concatenate([preds, tail], axis=0)
    return final, traj, preds
