"""Model shape/param-count parity vs the reference architecture spec
(nets.py:160-212 NewCritic, nets.py:452-523 UnetDecoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder

KEY = jax.random.PRNGKey(0)


def n_params(tree):
    return sum(p.size for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def critic_setup():
    x = jax.random.uniform(KEY, (2, 64, 64, 3))
    critic = Critic()
    params = critic.init({"params": KEY}, x, collect=True)
    return critic, params, x


def test_critic_shapes(critic_setup):
    critic, params, x = critic_setup
    pred, embeds = critic.apply(params, x, collect=True)
    assert pred.shape == (2, 1)
    # feature pyramid: post-pool1..4 + bottleneck (nets.py:197-206)
    assert [e.shape for e in embeds] == [
        (2, 32, 32, 8), (2, 16, 16, 8), (2, 8, 8, 8),
        (2, 4, 4, 16), (2, 1, 1, 32)]
    assert bool(jnp.all((pred > 0) & (pred < 1)))  # sigmoid head


def test_critic_param_count(critic_setup):
    # hand-count of nets.py:169-195 at chfak=1, neck=32:
    # convs 224+584+584+1168+8224, head 1056+33
    _, params, _ = critic_setup
    assert n_params(params) == 11873


def test_critic_no_collect(critic_setup):
    critic, params, x = critic_setup
    pred = critic.apply(params, x)
    assert pred.shape == (2, 1)


def test_critic_chfak_scaling():
    x = jnp.zeros((1, 64, 64, 3))
    critic = Critic(chfak=2)
    params = critic.init({"params": KEY}, x, collect=True)
    _, embeds = critic.apply(params, x, collect=True)
    assert embeds[0].shape[-1] == 16 and embeds[4].shape[-1] == 64


def test_decoder_shapes(critic_setup):
    critic, params, x = critic_setup
    _, embeds = critic.apply(params, x, collect=True)
    dec = UnetDecoder()
    dparams = dec.init({"params": KEY}, x, embeds)
    mask = dec.apply(dparams, x, embeds)
    assert mask.shape == (2, 64, 64, 1)
    assert bool(jnp.all((mask > 0) & (mask < 1)))
    # hand-count of nets.py:479-492: 1056+6928+1736+1160+1160+1600+145
    assert n_params(dparams) == 13785


def test_dropout_active_in_train_mode(critic_setup):
    critic, params, x = critic_setup
    d1 = critic.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    d2 = critic.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    det = critic.apply(params, x)
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert np.allclose(np.asarray(det),
                       np.asarray(critic.apply(params, x)))


def test_torch_default_init_distribution():
    """Kernel init must match torch kaiming_uniform(a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    x = jnp.zeros((1, 64, 64, 3))
    params = Critic().init({"params": KEY}, x)["params"]
    w = np.asarray(params["conv_neck"]["kernel"])  # fan_in 4*4*16=256
    bound = 1 / np.sqrt(256)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


def test_bf16_compute_path(critic_setup):
    """--bf16 models: bfloat16 conv stacks, float32 sigmoid outputs."""
    _, params, x = critic_setup
    critic16 = Critic(compute_dtype=jnp.bfloat16)
    pred, embeds = critic16.apply(params, x, collect=True)
    assert pred.dtype == jnp.float32
    assert embeds[0].dtype == jnp.bfloat16
    assert bool(jnp.isfinite(pred).all())
    dec16 = UnetDecoder(compute_dtype=jnp.bfloat16)
    dparams = dec16.init({"params": KEY}, x, embeds)
    mask = dec16.apply(dparams, x, embeds)
    assert mask.dtype == jnp.float32
    assert bool(jnp.isfinite(mask).all())
