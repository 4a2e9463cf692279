"""Mask-area self-supervision experiment (reference `sum_segm`,
TrainHandler.py:1896-1993): train a U-Net so each frame's soft-mask
pixel sum matches its own hard-mask (>0.5) pixel count, floored at 10
(TrainHandler.py:1935-1939) — a degenerate objective the sandbox used
to probe mask-area dynamics; ported for §2.4 completeness.

TPU design: the epoch runs as `visevery`-step `lax.scan` chunks over
device-resident frames (one dispatch per chunk), like the production
trainers."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


def sum_segm_loss(mask: Array, floor: float = 10.0) -> Array:
    """MSE between each frame's soft-mask sum and its hard-mask count
    clamped at `floor` (TrainHandler.py:1935-1939). The target is
    treated as a constant (torch's comparison tensor carries no
    grads)."""
    flat = mask.reshape(mask.shape[0], -1)
    soft_sum = flat.sum(axis=1)
    target = jnp.maximum((flat > 0.5).sum(axis=1).astype(mask.dtype),
                         floor)
    target = jax.lax.stop_gradient(target)
    return jnp.mean((soft_sum - target) ** 2)


def make_sum_segm_chunk(unet, tx: optax.GradientTransformation
                        ) -> Callable:
    """Jitted: (params, opt_state, x_all u8 (N,...), idx (S,B) i32)
    -> (params, opt_state, losses (S,))."""

    def loss_fn(params, x):
        mask = unet.apply({"params": params}, x)
        return sum_segm_loss(mask)

    def chunk(params, opt_state, x_all, idx):
        def body(carry, bidx):
            params, opt_state = carry
            x = jnp.take(x_all, bidx, axis=0).astype(jnp.float32) / 255.
            loss, grads = jax.value_and_grad(loss_fn)(params, x)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idx)
        return params, opt_state, losses

    return jax.jit(chunk, donate_argnums=(0, 1))


def train_sum_segm(unet, params, x_u8, steps: int, batch: int,
                   rng, chunk_steps: int = 50
                   ) -> Tuple[dict, list]:
    """Run `steps` optimizer steps on (N,64,64,3) uint8 frames;
    returns (params, loss history). Adam with torch defaults
    (TrainHandler.py:1902)."""
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    chunk = make_sum_segm_chunk(unet, tx)
    x_dev = jnp.asarray(x_u8)
    n = x_u8.shape[0]
    losses = []
    done = 0
    while done < steps:
        s = min(chunk_steps, steps - done)
        idx = rng.integers(0, n, (s, batch)).astype("int32")
        params, opt_state, ls = chunk(params, opt_state, x_dev,
                                      jnp.asarray(idx))
        losses.extend(jnp.asarray(ls).tolist())
        done += s
    return params, losses
