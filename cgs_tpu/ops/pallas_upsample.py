"""Single-pass nearest-neighbor x2 upsample (Pallas TPU kernel).

Why: the decoder's `jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)` lowers to
TWO XLA broadcasts, each a full HBM round-trip — for the 32->64 stage
of the `-process` program at batch 32768 that is 0.54 GB read +
1.07 GB written + re-read + 2.1 GB written (~9.6 ms of the ~50 ms
dispatch; profiles/r2_process_bf16_b32768, broadcast_in_dim.19-23).
A 6-D broadcast+reshape in plain XLA was measured 0.77x (it relayouts
the (8,128)-tiled intermediate — see models/decoder.py:upsample2x).

This kernel reads the input once and writes the output once:

  * W-duplication rides the MXU: `y = x @ D` with a constant 0/1
    duplication matrix D[(s), (o)] = [s == C*(o//(2C)) + o%C] — an
    exact gather-as-matmul (values are copied, not summed), because
    Mosaic supports neither lane-splitting reshapes nor lane-group
    gathers, while a (rows, WC) x (WC, 2WC) matmul is native. The
    dense FLOPs are ~2WC per element — noise next to the saved HBM
    round-trips.
  * H-duplication is free in the output indexing: the result is
    written as (rows, 2, 2WC), whose row-major order IS the NHWC
    (B, 2H, 2W, C) order — two plain stores, no relayout.

Measured on v5e-1 at the production shape (32768, 32, 32, 8) bf16
with scalar-readback sync: 11.9 ms vs 34.3 ms for the jnp repeat
chain under the same harness (2.9x isolated). NOT wired into the
decoder by default: the kernel's output must cross back into XLA as
a (B, 2H, 2W, C) conv input, and XLA's layout assignment at that
custom-call seam picks a 16x-padded (8, 128) tiling over the
(W, C=8) minor dims — a 34 GB allocation at batch 32768 that fails
compilation outright. See models/decoder.py:_auto_pallas_upsample
and RESULTS.md for the full decision trail.

Gradient: custom VJP — the adjoint of nearest x2 upsample is a 2x2
sum-pool (jnp reduce_window), so the kernel is usable inside the
training step too.

Interpret-mode fallback keeps the same code path runnable on the CPU
test mesh (tests/conftest.py's 8-device virtual mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgs_tpu.ops.pallas_kernels import _interpret

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def _dup_matrix(w: int, c: int, dtype_name: str) -> np.ndarray:
    """(W*C, 2*W*C) 0/1 matrix: out lane o = in lane C*(o//(2C)) + o%C."""
    o = np.arange(2 * w * c)
    s = c * (o // (2 * c)) + o % c
    d = np.zeros((w * c, 2 * w * c), np.float32)
    d[s, o] = 1.0
    return d.astype(dtype_name)


def _up2_kernel(x_ref, d_ref, out_ref):
    y = jnp.dot(x_ref[:], d_ref[:],
                preferred_element_type=jnp.float32)
    y = y.astype(out_ref.dtype)
    out_ref[:, 0, :] = y
    out_ref[:, 1, :] = y


def supports_pallas_upsample(x: Array) -> bool:
    """Lane tiling requires W*C % 128 == 0, and the (WC, 2WC)
    duplication matrix stays VMEM-resident across grid steps — cap
    WC at 512 (D <= 2 MB f32) so wide-channel variants (chfak > 2)
    fall back to the jnp path instead of failing Mosaic's VMEM
    allocation. Tiny stages stay on jnp too (their broadcasts are
    KBs, not GBs)."""
    _, _, w, c = x.shape
    return (w * c) % 128 == 0 and (w * c) <= 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x_pallas(x: Array, block_rows: int = 1024) -> Array:
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbor, one HBM read +
    one HBM write. Requires W*C % 128 == 0 (check with
    `supports_pallas_upsample`)."""
    return _up2_forward(x, block_rows)


def _up2_forward(x: Array, block_rows: int) -> Array:
    b, h, w, c = x.shape
    wc = w * c
    assert wc % 128 == 0, f"lane dim {wc} must be a multiple of 128"
    rows = b * h
    # upsampling is row-local, so blocks may span images; budget ~5 MB
    # of VMEM for the double-buffered row blocks (in wc + out 4wc
    # bytes/row, x2 buffers) — the D matrix (<= 2 MB, enforced by
    # supports_pallas_upsample) rides on top
    blk = max(8, min(block_rows,
                     (5 << 20) // (10 * wc * x.dtype.itemsize)))
    while rows % blk:
        blk -= 1
    grid = (rows // blk,)

    d = jnp.asarray(_dup_matrix(w, c, x.dtype.name))
    out = pl.pallas_call(
        _up2_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 2, 2 * wc), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, 2 * wc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 2, 2 * wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x.reshape(rows, wc), d)
    # (rows, 2, 2WC) row-major == (B, 2H, 2W, C) row-major
    return out.reshape(b, 2 * h, 2 * w, c)


def _up2_fwd(x: Array, block_rows: int):
    return _up2_forward(x, block_rows), None


def _up2_bwd(block_rows: int, _, g: Array):
    # adjoint of nearest x2: 2x2 sum-pool
    dx = jax.lax.reduce_window(g, jnp.zeros((), g.dtype), jax.lax.add,
                               (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return (dx,)


upsample2x_pallas.defvjp(_up2_fwd, _up2_bwd)
