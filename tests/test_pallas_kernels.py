"""Pallas kernel correctness (interpret mode on the CPU test mesh;
the same code compiles natively on TPU)."""

import jax
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


def test_merge_both_matches_jnp_forward_and_grad():
    """merge_both (fused fwd + custom-VJP bwd) == the plain jnp
    merges, values and gradients, including the z channel-sum."""
    from cgs_tpu.ops.merge import (
        inject_merge, merge_both, replace_merge,
    )

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((6, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.random((6, 64, 64, 3)), jnp.float32)
    z = jnp.asarray(rng.random((6, 64, 64, 1)), jnp.float32)

    rep, inj = merge_both(a, b, z)
    np.testing.assert_allclose(np.asarray(rep),
                               np.asarray(replace_merge(a, b, z)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(inj),
                               np.asarray(inject_merge(a, b, z)),
                               atol=1e-6)

    w1 = jnp.asarray(rng.random((6, 64, 64, 3)), jnp.float32)
    w2 = jnp.asarray(rng.random((6, 64, 64, 3)), jnp.float32)

    def loss_pallas(a, b, z):
        r, i = merge_both(a, b, z)
        return jnp.sum(r * w1) + jnp.sum(i * w2)

    def loss_jnp(a, b, z):
        return (jnp.sum(replace_merge(a, b, z) * w1)
                + jnp.sum(inject_merge(a, b, z) * w2))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(a, b, z)
    g_j = jax.grad(loss_jnp, argnums=(0, 1, 2))(a, b, z)
    for gp, gj in zip(g_p, g_j):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gj),
                                   atol=1e-4)


def test_masker_loss_pallas_merge_matches_plain():
    """build_masker_loss(pallas_merge=True) == the plain path: same
    loss and same grads (interpret-mode kernels on CPU)."""
    from cgs_tpu.core.config import Config
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    from cgs_tpu.train.losses import build_masker_loss

    cfg = Config(shift=0, dropout=0.0).derive()
    critic = Critic(dropout=0.0)
    masker = UnetDecoder()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    trainable = {"critic": cp, "masker": mp}

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((8, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.random((8, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.random(8), jnp.float32)

    plain = build_masker_loss(cfg, critic, masker, pallas_merge=False)
    fused = build_masker_loss(cfg, critic, masker, pallas_merge=True)
    (l0, _), g0 = jax.value_and_grad(plain, has_aux=True)(
        trainable, {}, a, y, b, key)
    (l1, _), g1 = jax.value_and_grad(fused, has_aux=True)(
        trainable, {}, a, y, b, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=1e-5), g0, g1)


class TestPallasUpsample:
    """ops/pallas_upsample.py — the single-pass x2 nearest upsample
    (matmul-gather W-duplication + free H-duplication in the output
    indexing). 2.9x the jnp repeat chain in isolation on v5e; kept
    opt-in because the XLA layout seam at the consumer conv loses the
    win (see module docstring)."""

    def test_matches_jnp_repeat_chain(self):
        from cgs_tpu.models.decoder import upsample2x
        from cgs_tpu.ops.pallas_upsample import (
            supports_pallas_upsample, upsample2x_pallas)
        rng = np.random.default_rng(0)
        for shape in [(4, 32, 32, 8), (3, 16, 16, 8), (2, 8, 8, 16),
                      (2, 4, 64, 2)]:
            x = jnp.asarray(rng.random(shape, dtype=np.float32))
            assert supports_pallas_upsample(x)
            np.testing.assert_array_equal(np.asarray(upsample2x_pallas(x)),
                                          np.asarray(upsample2x(x)))

    def test_unsupported_lane_dim_detected(self):
        from cgs_tpu.ops.pallas_upsample import supports_pallas_upsample
        assert not supports_pallas_upsample(jnp.zeros((2, 8, 8, 8)))

    def test_vjp_is_sum_pool(self):
        from cgs_tpu.models.decoder import upsample2x
        from cgs_tpu.ops.pallas_upsample import upsample2x_pallas
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((2, 16, 16, 8), dtype=np.float32))
        g = jax.grad(lambda v: jnp.sum(jnp.sin(upsample2x_pallas(v))))(x)
        gr = jax.grad(lambda v: jnp.sum(jnp.sin(upsample2x(v))))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=1e-6)

    def test_decoder_flag_parity(self):
        """UnetDecoder(use_pallas_upsample=True) is bit-identical to
        the jnp path (values are copies, not sums)."""
        from cgs_tpu import Critic, UnetDecoder
        rng = np.random.default_rng(2)
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((2, 64, 64, 3))
        critic = Critic()
        cp = critic.init({"params": key}, x0, collect=True)["params"]
        x = jnp.asarray(rng.random((4, 64, 64, 3), dtype=np.float32))
        _, em = critic.apply({"params": cp}, x, collect=True)
        m_ref = UnetDecoder(use_pallas_upsample=False)
        mp = m_ref.init({"params": key}, x, em)["params"]
        a = UnetDecoder(use_pallas_upsample=True).apply(
            {"params": mp}, x, em)
        b = m_ref.apply({"params": mp}, x, em)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernels_accept_empty_inputs():
    """N=0 must yield empty/zero results, not a ZeroDivisionError in
    the grid computation (e.g. device-resident IoU of an empty eval
    folder)."""
    from cgs_tpu.ops.pallas_kernels import (
        merge_pair, merge_pair_bwd, normalize_u8, threshold_iou,
    )

    e = jnp.zeros((0, 128), jnp.float32)
    assert normalize_u8(jnp.zeros((0, 128), jnp.uint8)).shape == (0, 128)
    r, i = merge_pair(e, e, e)
    assert r.shape == i.shape == (0, 128)
    da, db, dz = merge_pair_bwd(e, e, e, e, e)
    assert da.shape == db.shape == dz.shape == (0, 128)
    inter, union = threshold_iou(e, jnp.zeros((0, 128), bool), 0.5)
    assert int(inter) == 0 and int(union) == 0
