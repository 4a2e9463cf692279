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
import numpy as np

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


# numpy on purpose: module-level jnp arrays would initialize the
# default backend at import time, violating the backend-init ordering
# rule (CLAUDE.md: XLA_FLAGS must precede the FIRST backend init;
# this module is imported by train/steps and dryrun_multichip's deps)
_BLUR3 = np.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                    np.float32) / 16.0
_BLUR5 = np.asarray([[1, 4, 6, 4, 1], [4, 16, 24, 16, 4],
                     [6, 24, 36, 24, 6], [4, 16, 24, 16, 4],
                     [1, 4, 6, 4, 1]], np.float32) / 256.0


def gaussian_blur(x: Array, size: int) -> Array:
    """The `-blur` preprocessing of the sandbox loader
    (TrainHandler.py:274-282): a hand-rolled binomial 3x3 or 5x5
    Gaussian applied per channel (torch depthwise conv2d, groups=3).

    x: (B, H, W, C) floats, NHWC (the reference works NCHW; values
    match exactly). size: 3 or 5; anything else is identity (the
    reference only defines `blur` for those sizes and would NameError
    otherwise — quirk policy: no-op instead of the crash).
    """
    if size not in (3, 5):
        return x
    k = jnp.asarray(_BLUR3 if size == 3 else _BLUR5)
    c = x.shape[-1]
    kern = jnp.broadcast_to(k[:, :, None, None],
                            k.shape + (1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
