"""Counterfactual mask-merge ops.

The heart of the training algorithm (reference main.py:395,406):

    replaced = A * (1 - Z) + Z * B     # cut the masked content out of A
    injected = B * (1 - Z) + Z * A     # paste A's masked content into B

Z is a (B, H, W, 1) soft mask broadcast over RGB. These are pure
elementwise ops that XLA fuses into the adjacent critic conv; a Pallas
fused variant lives in `cgs_tpu.ops.pallas_kernels` for the inference
post-processing path where merges appear outside a conv fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def replace_merge(a: Array, b: Array, z: Array) -> Array:
    """A with its masked (reward-relevant) pixels replaced by B's
    (main.py:395). NHWC; z broadcasts over the channel axis."""
    return a * (1.0 - z) + z * b


def inject_merge(a: Array, b: Array, z: Array) -> Array:
    """B with A's masked pixels injected (main.py:406)."""
    return b * (1.0 - z) + z * a


@jax.custom_vjp
def merge_both(a: Array, b: Array, z: Array):
    """(replaced, injected) in one fused Pallas pass — both merges
    share one read of (a, b, z), and the custom VJP fuses the three
    cotangents the same way. NHWC a, b (B,H,W,3); z (B,H,W,1).

    Differentiable drop-in for (replace_merge, inject_merge),
    available via build_masker_loss(pallas_merge=True). NOT the
    default: measured 0.96x the plain-jnp step on v5e — XLA already
    fuses the merges into the adjacent critic convs
    (ops/pallas_kernels.py status note)."""
    from cgs_tpu.ops.pallas_kernels import broadcast_mask, merge_pair
    shape = a.shape
    n = shape[0]
    rep, inj = merge_pair(a.reshape(n, -1), b.reshape(n, -1),
                          broadcast_mask(z))
    return rep.reshape(shape), inj.reshape(shape)


def _merge_both_fwd(a, b, z):
    return merge_both(a, b, z), (a, b, z)


def _merge_both_bwd(res, cot):
    from cgs_tpu.ops.pallas_kernels import (
        broadcast_mask, merge_pair_bwd,
    )
    a, b, z = res
    gr, gi = cot
    shape = a.shape
    n = shape[0]
    da, db, dz3 = merge_pair_bwd(
        a.reshape(n, -1), b.reshape(n, -1), broadcast_mask(z),
        gr.reshape(n, -1), gi.reshape(n, -1))
    dz = dz3.reshape(shape).sum(axis=-1, keepdims=True)
    return da.reshape(shape), db.reshape(shape), dz


merge_both.defvjp(_merge_both_fwd, _merge_both_bwd)
