"""Shape tests for the legacy model zoo (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.models import zoo

KEY = jax.random.PRNGKey(0)
X = jnp.zeros((2, 64, 64, 3))


def init_apply(model, *args, **kwargs):
    variables = model.init({"params": KEY}, *args, **kwargs)
    return model.apply(variables, *args, **kwargs)


def test_legacy_critic():
    assert init_apply(zoo.LegacyCritic(), X).shape == (2, 1, 1, 1)


def test_small_critic():
    x16 = jnp.zeros((2, 16, 16, 3))
    assert init_apply(zoo.SmallCritic(), x16).shape == (2, 1, 1, 1)


def test_noscale_critic():
    x16 = jnp.zeros((2, 16, 16, 3))
    assert init_apply(zoo.NoScaleCritic(), x16).shape == (2, 13, 13, 1)


def test_autoencoder():
    recon, enc = init_apply(zoo.AutoEncoder(enc_dim=4), X)
    assert recon.shape == X.shape and enc.shape == (2, 4)


def test_vae():
    recon, mean, log_std = init_apply(zoo.VAE(enc_dim=4), X,
                                      key=jax.random.PRNGKey(1))
    assert recon.shape == X.shape
    assert mean.shape == (2, 4) and log_std.shape == (2, 4)
    loss = zoo.vae_loss(recon, X, mean, log_std)
    assert jnp.isfinite(loss)


def test_vae_requires_key_unless_deterministic():
    """The reference VAE ALWAYS rsamples (nets.py:98-99) — a silent
    sample=mean fallback would train a plain autoencoder; the mean
    path must be requested by name."""
    model = zoo.VAE(enc_dim=4)
    variables = model.init({"params": KEY}, X,
                           key=jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="PRNG key"):
        model.apply(variables, X)
    recon, mean, _ = model.apply(variables, X, deterministic=True)
    assert recon.shape == X.shape and mean.shape == (2, 4)


def test_resnet_bn_momentum_matches_torch():
    """torch BatchNorm2d(momentum=0.1) is an EMA keep-rate of 0.9 =
    flax's momentum; after one train-mode step from zero-init stats,
    running_mean must be 0.1 * batch_mean (the flax default 0.99
    would give 0.01x — stats absorbing 10x slower than torch)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5.0, 2.0, (16, 8, 8, 4)), jnp.float32)
    bn = zoo._bn(train=True)
    variables = bn.init(KEY, x)
    _, mutated = bn.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        0.1 * np.asarray(x.mean(axis=(0, 1, 2))), rtol=1e-5)


def test_resnet_conv_init_is_torch_default():
    """Fresh ResNet convs must draw from torch's kaiming_uniform
    (U(-1/sqrt(fan_in), +1/sqrt(fan_in))), like every other zoo
    module — not flax's truncated-normal lecun_normal."""
    variables = zoo.ResNet18Features().init(
        {"params": KEY}, X, train=False)
    stem = np.asarray(variables["params"]["Conv_0"]["kernel"])
    bound = 1.0 / np.sqrt(7 * 7 * 3)
    assert np.abs(stem).max() <= bound * (1 + 1e-6)
    # a uniform draw over 9408 samples lands near the bound; a
    # truncated normal at the same scale almost never does
    assert np.abs(stem).max() > 0.95 * bound


def test_conv_encoder_decoder():
    model = zoo.ConvEncoder64x64(enc_dim=4)
    variables = model.init({"params": KEY}, X)
    enc = model.apply(variables, X)
    assert enc.shape == (2, 1, 1, 4)
    enc2, embeds = model.apply(variables, X, embed=True)
    assert embeds.shape[1:3] == (64, 64)
    dec = init_apply(zoo.ConvDecoder64x64(enc_dim=4), enc)
    assert dec.shape == (2, 64, 64, 3)


def test_policy_net():
    obs = jnp.zeros((2, 64, 64, 6))
    logits = init_apply(zoo.PolicyNet(out_chs=10), obs)
    assert logits.shape == (2, 10)
    assert zoo.PolicyNet.greedy_action(logits).shape == (2,)


def test_unet_mask_and_critic():
    model = zoo.Unet()
    variables = model.init({"params": KEY}, X)
    mask = model.apply(variables, X)
    assert mask.shape == (2, 64, 64, 1)
    score = model.apply(variables, X, critic=True)
    assert score.shape == (2, 1)
    mask2, u0 = model.apply(variables, X, embeds=True)
    assert u0.shape[1:3] == (32, 32)


def test_small_unet():
    assert init_apply(zoo.SmallUnet(), X).shape == (2, 64, 64, 1)


def test_grounded_unet():
    assert init_apply(zoo.GroundedUnet(), X).shape == (2, 64, 64, 1)


def test_flexible_unet():
    assert init_apply(zoo.FlexibleUnet(), X).shape == (2, 64, 64, 1)


def test_vgg_critic():
    out = init_apply(zoo.VGGCritic(), X)
    assert out.shape == (2, 1)


def test_vgg_embedder():
    model = zoo.VGG11Features(collect_embeds=True)
    variables = model.init({"params": KEY}, X)
    feats, embeds = model.apply(variables, X)
    assert feats.shape == (2, 2, 2, 512)
    assert embeds.shape[1:3] == (64, 64)


def test_resnet_critic():
    model = zoo.ResNetCritic()
    variables = model.init({"params": KEY}, X)
    out = model.apply(variables, X)
    assert out.shape == (2, 1)


def test_printer_and_pass_are_identities(capsys):
    from cgs_tpu.models.zoo import Pass, Printer

    x = jnp.ones((2, 4, 4, 3))
    p = Printer()
    out = p.apply(p.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert "(2, 4, 4, 3)" in capsys.readouterr().out
    q = Pass()
    out = q.apply(q.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_unet_param_tree_branch_independent(rng):
    """init under critic=True must yield the FULL tree (encoder +
    critic head + decoder) so the same params serve both modes."""
    import jax
    import numpy as np
    from cgs_tpu.models.zoo import Unet

    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    p_crit = Unet().init(jax.random.PRNGKey(0), x,
                         critic=True)["params"]
    p_mask = Unet().init(jax.random.PRNGKey(0), x)["params"]
    assert set(p_crit) == set(p_mask)
    # and the critic-init params run mask-mode without missing leaves
    y = Unet().apply({"params": p_crit}, x)
    assert y.shape == (2, 64, 64, 1)


def test_convT_init_uses_torch_transpose_fan_in():
    """torch ConvTranspose2d fan-in is OUT_ch * k^2 (weight.size(1) x
    receptive field, weight being (in, out, kh, kw)) — NOT in_ch*k^2
    like Conv2d. A (4,4,32,16) flax kernel must draw from
    +/-1/sqrt(16*16), not +/-1/sqrt(32*16)."""
    import jax
    from cgs_tpu.core.init import (
        make_torch_convT_bias_init, torch_convT_kernel_init,
    )

    k = torch_convT_kernel_init(jax.random.PRNGKey(0), (4, 4, 32, 16))
    bound = 1.0 / np.sqrt(16 * 4 * 4)
    assert float(np.abs(np.asarray(k)).max()) <= bound
    # and it actually fills the band (would fail for the conv fan-in
    # bound 1/sqrt(32*16)=0.0442 < 0.0625)
    assert float(np.abs(np.asarray(k)).max()) > 1.0 / np.sqrt(32 * 16)
    b = make_torch_convT_bias_init((4, 4, 32, 16))(
        jax.random.PRNGKey(1), (16,))
    assert float(np.abs(np.asarray(b)).max()) <= bound


def test_grounded_unet_down_matches_torch_interpolate():
    """GroundedUnet's bilinear 0.5x downscale must equal torch
    F.interpolate(scale_factor=0.5, mode='bilinear',
    align_corners=False) (nets.py:653) = plain 2x2 block averages —
    jax.image.resize's default antialias must stay OFF."""
    import jax

    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = jax.image.resize(jnp.asarray(x), (1, 2, 2, 1), "bilinear",
                           antialias=False)
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               [2.5, 4.5, 10.5, 12.5])


def test_vgg_critic_resize_is_nearest():
    """VGGCritic's resize matches the reference's default-mode
    F.interpolate (nearest, nets.py:783): upscaled frames are
    blockwise-constant, which bilinear would smooth."""
    import jax
    from cgs_tpu.models.zoo import VGGCritic

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3),
                                        dtype=np.float32))
    m = VGGCritic(resize=128)
    # probe the resize through the module by capturing the features
    # input: nearest means out[2i,2j] == out[2i+1,2j+1]
    up = jax.image.resize(x, (1, 128, 128, 3), "nearest")
    np.testing.assert_array_equal(np.asarray(up[:, ::2, ::2]),
                                  np.asarray(up[:, 1::2, 1::2]))
    # and the module still runs end-to-end at the doubled resize
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    assert m.apply({"params": p}, x).shape == (1, 1)
