"""Data parallelism in the PRODUCT path (not just the library):
`python -m cgs_tpu.cli -train` on an N-device host must train over the
('data','model') mesh — banks replicated, per-step index stacks
sharded, XLA all-reducing gradients — and match single-device training
(SURVEY.md §2.5 row 1; reference analogue: none, main.py is strictly
single-device).

Tolerances are measured, not guessed: DP changes the reduction order
of batch means, so params drift ~1e-4 over ~10 Adam steps (asserted
tight) and chaotically over full runs (asserted behaviorally: the
hard masks of the two trained models agree pixel-for-pixel)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.cli import main
from cgs_tpu.core.config import Config
from cgs_tpu.handler import Handler

pytestmark = pytest.mark.slow  # CLI-level DP-vs-single training equivalence runs

ARGS = ["-train", "-synthetic_data", "--datasize", "2000",
        "--testsize", "200", "--cepochs", "8", "--visevery", "40",
        "--dropout", "0", "--shift", "0", "--contrastive-min", "100"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dp")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def _flat(tree):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(tree)])


def test_handler_builds_mesh_by_default(tmp_path):
    """data_parallel=0 (the default) -> all local devices; the test
    env has 8, so the production Handler must come up meshed.
    (Handler.__init__ opens <model>/metrics.jsonl, so point the run
    dirs into tmp_path — bare names would litter the repo root.)"""
    cfg = Config(model=str(tmp_path / "meshcheck")).derive()
    h = Handler(cfg)
    assert h.mesh is not None
    assert dict(h.mesh.shape) == {"data": 8, "model": 1}
    # and --data-parallel 1 opts out (plain jit)
    assert Handler(Config(model=str(tmp_path / "m1"),
                          data_parallel=1).derive()).mesh is None


def test_critic_pipe_dp_matches_single(workdir):
    """Production critic_pipe (scan chunks, loader, artifacts) over
    the mesh == single device, ~10 steps, measured drift ~1e-4."""

    def run(dp):
        cfg = Config(train=True, synthetic_data=True, datasize=600,
                     testsize=100, cepochs=1, visevery=10, dropout=0.0,
                     shift=0, data_parallel=dp, cload=False,
                     model=f"short{dp}").derive()
        h = Handler(cfg)
        h.load_data()
        h.critic_pipe()
        return h

    h1, h8 = run(1), run(8)
    assert h8.mesh is not None
    a, b = _flat(h1.params["critic"]), _flat(h8.params["critic"])
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_cli_dp_full_run_matches_single(workdir):
    """The VERDICT-r1 acceptance: cli.main('-train -synthetic_data')
    over the 8-device mesh vs forced single-device — full two-phase
    training. Hard masks of the two trained models must agree
    pixel-for-pixel on held-out frames (soft values drift ~1e-2 from
    reduction-order chaos over ~250 Adam steps; measured agreement
    is exactly 1.0)."""
    h1 = main(ARGS + ["--data-parallel", "1", "--model", "dpcli1"])
    h8 = main(ARGS + ["--data-parallel", "8", "--model", "dpcli8"])
    assert h8.mesh is not None and h1.mesh is None

    x = h1.data.x_test
    m1 = h1._pipeline(salience=False).run(x).masks.squeeze(-1)
    m8 = h8._pipeline(salience=False).run(x).masks.squeeze(-1)
    hard1, hard8 = m1 > 0.05, m8 > 0.05
    agreement = float((hard1 == hard8).mean())
    assert agreement >= 0.995, agreement
    inter = (hard1 & hard8).sum()
    union = (hard1 | hard8).sum()
    assert inter / max(union, 1) >= 0.99

    # both runs produced the reference artifact layout
    for run_dir in ("dpcli1", "dpcli8"):
        assert list((workdir / run_dir / "saves").glob("critic-*.pt"))
        assert list((workdir / run_dir / "saves").glob("masker-*.pt"))
        assert (workdir / run_dir / "segment" / "_loss.png").exists()


def test_masker_chunk_dp_matches_single():
    """The production scanned masker chunk (train/loops.py) with a
    mesh == without, same index stacks, 4 steps."""
    from cgs_tpu.parallel.mesh import (
        index_sharding, make_mesh, replicated_sharding,
    )
    from cgs_tpu.train.loops import make_masker_chunk
    from cgs_tpu.train.steps import (
        init_train_state, make_optimizer, trained_param_keys,
    )

    cfg = Config(shift=0, dropout=0.0).derive()
    critic_model = __import__(
        "cgs_tpu.models.critic", fromlist=["Critic"]).Critic(dropout=0.0)
    decoder_model = __import__(
        "cgs_tpu.models.decoder",
        fromlist=["UnetDecoder"]).UnetDecoder()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic_model.init({"params": key}, x0, collect=True)["params"]
    _, em = critic_model.apply({"params": cp}, x0, collect=True)
    mp = decoder_model.init({"params": key}, x0, em)["params"]
    params = {"critic": cp, "masker": mp}

    rng = np.random.default_rng(7)
    xpos = rng.integers(0, 256, (80, 64, 64, 3), dtype=np.uint8)
    xneg = rng.integers(0, 256, (90, 64, 64, 3), dtype=np.uint8)
    ypos = rng.random(80).astype(np.float32)
    yneg = rng.random(90).astype(np.float32)
    h = rng.integers(0, 80, (4, 32), dtype=np.int32)
    l = rng.integers(0, 90, (4, 32), dtype=np.int32)
    c = rng.integers(0, 90, (4, 64), dtype=np.int32)
    tx = make_optimizer()
    trained = trained_param_keys(cfg)

    ref_state = init_train_state(
        jax.tree.map(np.asarray, params), tx, trained)
    ref_chunk = make_masker_chunk(cfg, critic_model, decoder_model, tx)
    ref_state, ref_losses = ref_chunk(
        ref_state, jnp.asarray(xpos), jnp.asarray(ypos),
        jnp.asarray(xneg), jnp.asarray(yneg), jnp.asarray(h),
        jnp.asarray(l), jnp.asarray(c), key)

    mesh = make_mesh(n_data=8)
    repl, idx_sh = replicated_sharding(mesh), index_sharding(mesh)
    dp_state = init_train_state(
        jax.device_put(jax.tree.map(np.asarray, params), repl), tx,
        trained)
    dp_chunk = make_masker_chunk(cfg, critic_model, decoder_model, tx,
                                 mesh=mesh)
    dp_state, dp_losses = dp_chunk(
        dp_state, jax.device_put(xpos, repl),
        jax.device_put(ypos, repl), jax.device_put(xneg, repl),
        jax.device_put(yneg, repl), jax.device_put(h, idx_sh),
        jax.device_put(l, idx_sh), jax.device_put(c, idx_sh), key)

    np.testing.assert_allclose(np.asarray(dp_losses),
                               np.asarray(ref_losses), atol=1e-5)
    jax.tree.map(
        lambda s, d: np.testing.assert_allclose(
            np.asarray(s), np.asarray(d), atol=1e-4),
        ref_state.params, dp_state.params)


def test_pipeline_mesh_inference_matches_plain():
    """MaskPipeline with a mesh (params replicated, batches sharded
    over 'data') == plain single-device inference, same params."""
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    from cgs_tpu.parallel.mesh import make_mesh
    from cgs_tpu.pipeline import MaskPipeline

    key = jax.random.PRNGKey(0)
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    params = {"critic": cp, "masker": mp}

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (40, 64, 64, 3), dtype=np.uint8)

    plain = MaskPipeline(critic, masker, params, batch_size=16)
    meshed = MaskPipeline(critic, masker, params, batch_size=16,
                          mesh=make_mesh(n_data=8))
    a = plain.run(frames)
    b = meshed.run(frames)   # 16 -> padded to shard-even, ragged tail
    np.testing.assert_allclose(b.preds, a.preds, atol=1e-5)
    np.testing.assert_allclose(b.masks, a.masks, atol=1e-5)


def test_index_sharding_divisibility_fallback():
    """Batch axes that don't divide the 'data' extent (the fixed
    contrastive k=32 on a >32-chip mesh, odd --batch-size) degrade to
    replicated placement — correct math, no dispatch error."""
    from jax.sharding import PartitionSpec as P

    from cgs_tpu.parallel.mesh import index_sharding, make_mesh

    mesh = make_mesh(n_data=8)
    assert index_sharding(mesh, 32).spec == P(None, "data")
    assert index_sharding(mesh, 64).spec == P(None, "data")
    assert index_sharding(mesh, 30).spec == P()
    assert index_sharding(mesh, 4).spec == P()

    # end-to-end: a non-divisible critic batch trains over the mesh
    cfg = Config(train=True, synthetic_data=True, datasize=300,
                 testsize=60, cepochs=1, visevery=5, dropout=0.0,
                 shift=0, cload=False, batch_size=30,
                 model="odd").derive()
    import os as _os
    import tempfile
    old = _os.getcwd()
    _os.chdir(tempfile.mkdtemp())
    try:
        h = Handler(cfg)
        assert h.mesh is not None
        h.load_data()
        h.critic_pipe()    # would raise at dispatch without fallback
    finally:
        _os.chdir(old)


def test_frozen_single_device_params_survive_donation(workdir):
    """-frozen on a SINGLE device (mesh None): the masker chunk's
    buffer donation deletes the old state buffers, and self.params
    aliases them — the full-tree _sync_params must restore every
    sub-tree (incl. the un-trained critic) or the post-train eval
    crashes on a deleted array. The 8-device test mesh masks this
    (replication copies), so force data_parallel=1."""
    import numpy as np

    from cgs_tpu.cli import main

    h = main(["-train", "-eval", "-synthetic_data", "--data-parallel",
              "1", "-frozen", "--datasize", "800", "--testsize", "100",
              "--cepochs", "3", "--visevery", "20", "--dropout", "0",
              "--shift", "0", "--contrastive-min", "5",
              "--high-rew-thresh", "0.02", "--low-rew-thresh", "0.98",
              "--model", "frozenrun"])
    assert h.mesh is None
    # every param leaf is alive and fetchable
    for tree in h.params.values():
        import jax
        jax.tree.map(np.asarray, tree)
    assert h.last_ious
