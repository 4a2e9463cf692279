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

import jax.numpy as jnp

Array = jnp.ndarray


def replace_merge(a: Array, b: Array, z: Array) -> Array:
    """A with its masked (reward-relevant) pixels replaced by B's
    (main.py:395). NHWC; z broadcasts over the channel axis."""
    return a * (1.0 - z) + z * b


def inject_merge(a: Array, b: Array, z: Array) -> Array:
    """B with A's masked pixels injected (main.py:406)."""
    return b * (1.0 - z) + z * a
