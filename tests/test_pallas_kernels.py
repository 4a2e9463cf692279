"""Pallas kernel correctness (interpret mode on the CPU test mesh;
the same code compiles natively on TPU)."""

import jax.numpy as jnp
import numpy as np

from cgs_tpu.ops.pallas_kernels import (
    broadcast_mask, merge_pair, normalize_u8, threshold_iou,
)


def test_normalize_u8(rng):
    x = rng.integers(0, 256, (16, 12288), dtype=np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(x)))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0,
                               rtol=1e-6)


def test_normalize_u8_ragged_rows(rng):
    # N not a multiple of the block size
    x = rng.integers(0, 256, (130, 128), dtype=np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(x), block_n=64))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0,
                               rtol=1e-6)


def test_merge_pair_matches_reference_math(rng):
    n = 8
    a = rng.random((n, 4, 4, 3)).astype(np.float32)
    b = rng.random((n, 4, 4, 3)).astype(np.float32)
    z = rng.random((n, 4, 4, 1)).astype(np.float32)
    # pad the flat dim to 128 lanes for the kernel contract
    f = 4 * 4 * 3
    pad = 128 - f
    af = np.pad(a.reshape(n, -1), ((0, 0), (0, pad)))
    bf = np.pad(b.reshape(n, -1), ((0, 0), (0, pad)))
    zf = np.pad(np.asarray(broadcast_mask(jnp.asarray(z))),
                ((0, 0), (0, pad)))
    rep, inj = merge_pair(jnp.asarray(af), jnp.asarray(bf),
                          jnp.asarray(zf))
    rep = np.asarray(rep)[:, :f].reshape(a.shape)
    inj = np.asarray(inj)[:, :f].reshape(a.shape)
    np.testing.assert_allclose(rep, a * (1 - z) + z * b, rtol=1e-5)
    np.testing.assert_allclose(inj, b * (1 - z) + z * a, rtol=1e-5)


def test_threshold_iou(rng):
    n, f = 300, 4096
    masks = rng.random((n, f)).astype(np.float32)
    gt = rng.random((n, f)) > 0.7
    thresh = 0.05
    inter, union = threshold_iou(jnp.asarray(masks), jnp.asarray(gt),
                                 thresh)
    hard = masks > thresh
    assert int(inter) == int(np.sum(hard & gt))
    assert int(union) == int(np.sum(hard | gt))
