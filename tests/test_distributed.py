"""Distributed-without-cluster tests (SURVEY.md §4 item 4): the
8-virtual-device CPU mesh must produce the same math as single-device
execution — pmap/pjit-style DP step == plain step, eval IoU reduction
== host reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated_sharding,
)
from cgs_tpu.train.steps import (
    init_train_state, make_critic_step, make_masker_step,
    make_optimizer,
)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def setup():
    critic = Critic(dropout=0.0)
    masker = UnetDecoder()
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": KEY}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": KEY}, x0, em)["params"]
    return critic, masker, {"critic": cp, "masker": mp}


def _batch(n=16):
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 256, (n, 64, 64, 3),
                                 dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (n, 64, 64, 3),
                                 dtype=np.uint8))
    y = jnp.asarray(rng.random(n).astype(np.float32))
    return a, y, b


def _host(tree):
    return jax.tree.map(lambda x: np.array(x), tree)


def test_mesh_shape():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_critic_dp_step_matches_single(setup):
    critic, _, params = setup
    cfg = Config(shift=0, dropout=0.0)
    tx = make_optimizer()
    a, y, _ = _batch()

    ref_state = init_train_state(_host({"critic": params["critic"]}),
                                 tx)
    ref_step = make_critic_step(cfg, critic, tx)
    ref_state, ref_loss = ref_step(ref_state, a, y, KEY)

    mesh = make_mesh(n_data=8)
    dp_state = init_train_state(
        jax.device_put(_host({"critic": params["critic"]}),
                       replicated_sharding(mesh)), tx)
    dp_step = make_critic_step(cfg, critic, tx, mesh=mesh)
    sh = data_sharding(mesh)
    dp_state, dp_loss = dp_step(dp_state, jax.device_put(a, sh),
                                jax.device_put(y, sh), KEY)

    np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                               rtol=1e-5)
    jax.tree.map(
        lambda s, d: np.testing.assert_allclose(
            np.asarray(s), np.asarray(d), atol=1e-6),
        ref_state.params, dp_state.params)


def test_masker_dp_step_matches_single(setup):
    critic, masker, params = setup
    cfg = Config(shift=0, dropout=0.0).derive()
    tx = make_optimizer()
    a, y, b = _batch()

    ref_state = init_train_state(_host(params), tx,
                                 ["masker", "critic"])
    ref_step = make_masker_step(cfg, critic, masker, tx)
    ref_state, ref_metrics = ref_step(ref_state, a, y, b, KEY)

    mesh = make_mesh(n_data=8)
    dp_state = init_train_state(
        jax.device_put(_host(params), replicated_sharding(mesh)), tx,
        ["masker", "critic"])
    dp_step = make_masker_step(cfg, critic, masker, tx, mesh=mesh)
    sh = data_sharding(mesh)
    dp_state, dp_metrics = dp_step(
        dp_state, jax.device_put(a, sh), jax.device_put(y, sh),
        jax.device_put(b, sh), KEY)

    for k in ref_metrics:
        np.testing.assert_allclose(float(dp_metrics[k]),
                                   float(ref_metrics[k]), rtol=1e-4)
    jax.tree.map(
        lambda s, d: np.testing.assert_allclose(
            np.asarray(s), np.asarray(d), atol=1e-5),
        ref_state.params, dp_state.params)


def test_dp_step_nondivisible_batch_falls_back(setup):
    """A runtime batch not divisible by the 'data' extent (e.g. the
    tail batch of an externally-driven loop) must execute with
    replicated placement and match the single-device step — not die
    in jit's divisibility ValueError, which the old static-batch
    guard could not prevent."""
    critic, _, params = setup
    cfg = Config(shift=0, dropout=0.0)
    tx = make_optimizer()
    a, y, _ = _batch(12)   # 12 % 8 != 0

    ref_state = init_train_state(_host({"critic": params["critic"]}),
                                 tx)
    ref_step = make_critic_step(cfg, critic, tx)
    ref_state, ref_loss = ref_step(ref_state, a, y, KEY)

    mesh = make_mesh(n_data=8)
    dp_state = init_train_state(
        jax.device_put(_host({"critic": params["critic"]}),
                       replicated_sharding(mesh)), tx)
    dp_step = make_critic_step(cfg, critic, tx, mesh=mesh)
    dp_state, dp_loss = dp_step(dp_state, a, y, KEY)
    np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                               rtol=1e-5)


def test_iou_psum_reduction_matches_host():
    """Multi-chip eval IoU = psum of per-shard (inter, union) counts
    (SURVEY.md §5 'Distributed communication backend')."""
    from jax.sharding import PartitionSpec as P

    from cgs_tpu.ops.iou import iou_counts

    rng = np.random.default_rng(0)
    a = rng.random((16, 64, 64)) > 0.5
    b = rng.random((16, 64, 64)) > 0.5
    host_iou = (a & b).sum() / (a | b).sum()

    mesh = make_mesh(n_data=8)

    @jax.jit
    def sharded_counts(aa, bb):
        i, u = iou_counts(aa, bb)
        return i, u

    sh = jax.sharding.NamedSharding(mesh, P("data"))
    i, u = sharded_counts(jax.device_put(a, sh), jax.device_put(b, sh))
    assert abs(int(i) / int(u) - host_iou) < 1e-9
