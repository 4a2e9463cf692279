"""Parameter initializers matching PyTorch layer defaults.

The reference relies on torch's default `kaiming_uniform_(a=sqrt(5))`
for Conv2d/Linear weights and `U(-1/sqrt(fan_in), 1/sqrt(fan_in))` for
biases (implicit in nets.py — no explicit init code exists). With
a=sqrt(5) the kaiming bound reduces to exactly `1/sqrt(fan_in)`. We
reproduce that so a fresh cgs_tpu model starts in the same weight
distribution as a fresh reference model (same learned-value landscape,
SURVEY.md §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fan_in(shape) -> int:
    if len(shape) == 2:            # Dense kernel (in, out)
        return shape[0]
    # Conv kernel (kh, kw, in_ch, out_ch) — receptive field × in channels
    return int(np.prod(shape[:-1]))


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == kaiming_uniform(a=sqrt(5))."""
    bound = 1.0 / np.sqrt(_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(kernel_shape):
    """torch bias init needs the *kernel's* fan-in, which flax does not
    pass to bias initializers — so we close over it."""
    bound = 1.0 / np.sqrt(_fan_in(kernel_shape))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _convT_fan_in(shape) -> int:
    """torch ConvTranspose2d fan-in: its weight is (in, out, kh, kw)
    and _calculate_fan_in_and_fan_out takes size(1) x receptive field
    = OUT_ch * kh * kw. flax ConvTranspose kernels are
    (kh, kw, in, out)."""
    return int(shape[-1] * np.prod(shape[:-2]))


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.ConvTranspose2d default weight init:
    U(-1/sqrt(out*k^2), +1/sqrt(out*k^2))."""
    bound = 1.0 / np.sqrt(_convT_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_convT_bias_init(kernel_shape):
    """torch nn.ConvTranspose2d default bias init (same fan-in rule
    as its weight: out*k^2)."""
    bound = 1.0 / np.sqrt(_convT_fan_in(kernel_shape))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
