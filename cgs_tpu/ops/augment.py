"""Horizontal circular shift augmentation (reference main.py:584-591).

The reference draws `xshift = int(shift * U[0,1])` and rolls the width
axis left or right with probability 1/2. A roll by -k and +k over a
circular axis are both uniform over the same support, so we draw a
signed shift; semantics match `shift_batch`. Implemented with
`jnp.roll` (a cheap lane rotation on TPU) and traced shift amounts so
it lives inside the jitted train step — no host RNG, no recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def shift_batch(key: jax.Array, x: Array, max_shift: int) -> Array:
    """Roll the whole batch by one random horizontal offset (the
    reference shifts the full batch by a single draw, main.py:585).

    x: (B, H, W, C). max_shift: the --shift flag (default 12).
    """
    k1, k2 = jax.random.split(key)
    xshift = jnp.floor(
        max_shift * jax.random.uniform(k1, ())).astype(jnp.int32)
    sign = jnp.where(jax.random.uniform(k2, ()) > 0.5, -1, 1)
    return jnp.roll(x, sign * xshift, axis=2)
