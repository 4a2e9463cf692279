"""Seed-parallel multirun (sandbox/seed_parallel.py): the vmapped
trainer must reproduce the serial chunk trainers per-seed exactly,
the seed axis must shard over the mesh without changing results
(seed-per-device), and the two-phase driver must run end-to-end on
the synthetic fixture. Reference protocol: TrainHandler.py:4024-4056
(the serial --runs loop this module parallelizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.parallel.mesh import make_mesh
from cgs_tpu.sandbox import seed_parallel as sp
from cgs_tpu.train.loops import make_critic_chunk, make_masker_chunk
from cgs_tpu.train.steps import (
    init_train_state, make_optimizer, trained_param_keys,
)

R = 2
CFG = Config(shift=4, dropout=0.0, batch_size=8).derive()


@pytest.fixture(scope="module")
def setup():
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(R, dtype=np.uint32))
    params = jax.tree.map(
        np.asarray, sp.init_seed_params(critic, masker, keys))
    rng = np.random.default_rng(0)
    x_all = jnp.asarray(rng.integers(0, 256, (32, 64, 64, 3),
                                     dtype=np.uint8))
    y_all = jnp.asarray(rng.random(32).astype(np.float32))
    ck = np.asarray(jax.vmap(
        lambda k: jax.random.fold_in(k, 5))(keys))
    return critic, masker, params, x_all, y_all, ck


def _seed_slice(tree, r):
    return jax.tree.map(lambda a: jnp.asarray(a[r]), tree)


def test_init_seed_params_differ(setup):
    _, _, params, *_ = setup
    leaf = jax.tree.leaves(params)[0]
    assert leaf.shape[0] == R
    with np.testing.assert_raises(AssertionError):
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(params["critic"])[0][0]),
            np.asarray(jax.tree.leaves(params["critic"])[0][1]))


def test_seeded_critic_chunk_matches_serial(setup):
    critic, _, params, x_all, y_all, ck = setup
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 32, (R, 3, 8)).astype(np.int32)

    tx = make_optimizer()
    sstate = sp.init_seed_state(
        {"critic": jax.tree.map(jnp.asarray, params["critic"])}, tx)
    cchunk = sp.make_seeded_critic_chunk(CFG, critic, tx)
    valid = np.ones(3, bool)
    sstate, vlosses = cchunk(sstate, x_all, y_all, valid, idx, ck)
    vparams = jax.tree.map(np.asarray, sstate.params)
    vlosses = np.asarray(vlosses)
    assert vlosses.shape == (R, 3)

    serial = make_critic_chunk(CFG, critic, make_optimizer())
    for r in range(R):
        st = init_train_state(
            {"critic": _seed_slice(params["critic"], r)},
            make_optimizer())
        st, losses = serial(st, x_all, y_all, jnp.asarray(idx[r]),
                            jnp.asarray(ck[r]))
        np.testing.assert_allclose(np.asarray(losses), vlosses[r],
                                   rtol=1e-5, atol=1e-6)
        for pv, ps in zip(jax.tree.leaves(vparams),
                          jax.tree.leaves(jax.tree.map(np.asarray,
                                                       st.params))):
            np.testing.assert_allclose(pv[r], ps, rtol=1e-4,
                                       atol=1e-6)


@pytest.mark.slow  # 12-step sharded-vs-serial masker chunk (~2 min, 1 CPU)
def test_seeded_masker_chunk_matches_serial(setup):
    critic, masker, params, x_all, y_all, ck = setup
    rng = np.random.default_rng(2)
    h = rng.integers(0, 32, (R, 3, 32)).astype(np.int32)
    l = rng.integers(0, 32, (R, 3, 32)).astype(np.int32)
    c = rng.integers(0, 32, (R, 3, 64)).astype(np.int32)

    tx = make_optimizer()
    trained = trained_param_keys(CFG)
    mstate = sp.init_seed_state(
        jax.tree.map(jnp.asarray, dict(params)), tx, trained)
    mchunk = sp.make_seeded_masker_chunk(CFG, critic, masker, tx)
    valid = np.ones(3, bool)
    mstate, vlosses = mchunk(mstate, x_all, y_all, valid, h, l, c, ck)
    vparams = jax.tree.map(np.asarray, mstate.params)
    vlosses = np.asarray(vlosses)
    assert vlosses.shape == (R, 3, 4)

    serial = make_masker_chunk(CFG, critic, masker, make_optimizer())
    for r in range(R):
        st = init_train_state(_seed_slice(params, r),
                              make_optimizer(), trained)
        st, losses = serial(st, x_all, y_all, x_all, y_all,
                            jnp.asarray(h[r]), jnp.asarray(l[r]),
                            jnp.asarray(c[r]), jnp.asarray(ck[r]))
        np.testing.assert_allclose(np.asarray(losses), vlosses[r],
                                   rtol=1e-4, atol=1e-6)
        for pv, ps in zip(jax.tree.leaves(vparams),
                          jax.tree.leaves(jax.tree.map(np.asarray,
                                                       st.params))):
            np.testing.assert_allclose(pv[r], ps, rtol=1e-4,
                                       atol=1e-6)


@pytest.mark.slow  # 3 variants x 2-step chunks vs serial (~2 min, 1 CPU)
@pytest.mark.parametrize("variant", ["frozen", "noinject", "separate"])
def test_seeded_masker_chunk_matches_serial_variants(setup, variant):
    """Ablation-variant parity: the seeded masker chunk must equal the
    serial chunk per seed under -frozen (critic not differentiated,
    main.py:330-334), -noinject (inject term dropped, main.py:411-418)
    and -separate (sepcrit trained alongside, main.py:946-947) — the
    stop-grad/trained-keys topology must survive the vmap+shard path
    used for the 10-seed ablation tables in RESULTS.md."""
    critic, masker, _, x_all, y_all, ck = setup
    cfg = Config(shift=4, dropout=0.0, batch_size=8,
                 **{variant: True}).derive()
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(R, dtype=np.uint32))
    params = jax.tree.map(np.asarray, sp.init_seed_params(
        critic, masker, keys, separate=cfg.separate))
    rng = np.random.default_rng(7)
    h = rng.integers(0, 32, (R, 2, 32)).astype(np.int32)
    l = rng.integers(0, 32, (R, 2, 32)).astype(np.int32)
    c = rng.integers(0, 32, (R, 2, 64)).astype(np.int32)

    tx = make_optimizer()
    trained = trained_param_keys(cfg)
    mstate = sp.init_seed_state(
        jax.tree.map(jnp.asarray, dict(params)), tx, trained)
    mchunk = sp.make_seeded_masker_chunk(cfg, critic, masker, tx)
    valid = np.ones(2, bool)
    mstate, vlosses = mchunk(mstate, x_all, y_all, valid, h, l, c, ck)
    vparams = jax.tree.map(np.asarray, mstate.params)
    vlosses = np.asarray(vlosses)
    if variant == "frozen":   # critic params must be bit-unchanged
        for pv, p0 in zip(jax.tree.leaves(vparams["critic"]),
                          jax.tree.leaves(params["critic"])):
            np.testing.assert_array_equal(pv, p0)
    if variant == "noinject":  # the inject column is zeroed
        # row layout [replace, inject, norm, critic], loops.py:193
        np.testing.assert_allclose(vlosses[..., 1], 0.0, atol=1e-7)

    serial = make_masker_chunk(cfg, critic, masker, make_optimizer())
    for r in range(R):
        st = init_train_state(_seed_slice(params, r),
                              make_optimizer(), trained)
        st, losses = serial(st, x_all, y_all, x_all, y_all,
                            jnp.asarray(h[r]), jnp.asarray(l[r]),
                            jnp.asarray(c[r]), jnp.asarray(ck[r]))
        np.testing.assert_allclose(np.asarray(losses), vlosses[r],
                                   rtol=1e-4, atol=1e-6)
        for pv, ps in zip(jax.tree.leaves(vparams),
                          jax.tree.leaves(jax.tree.map(np.asarray,
                                                       st.params))):
            np.testing.assert_allclose(pv[r], ps, rtol=1e-4,
                                       atol=1e-6)


@pytest.mark.slow  # meshed-vs-vmapped chunk equivalence (~80 s, 1 CPU)
def test_seed_sharded_mesh_matches_unsharded(setup):
    """8 seeds sharded over the 8-device 'data' axis (seed-per-device)
    == the same 8 seeds vmapped unsharded."""
    critic, _, _, x_all, y_all, _ = setup
    mesh = make_mesh(n_data=8)
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(8, dtype=np.uint32))
    params = jax.tree.map(
        np.asarray,
        sp.init_seed_params(critic, UnetDecoder(), keys))
    ck = np.asarray(keys)
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 32, (8, 2, 8)).astype(np.int32)

    def run(mesh_arg):
        tx = make_optimizer()
        sstate = sp.init_seed_state(
            {"critic": jax.tree.map(jnp.asarray, params["critic"])},
            tx)
        chunk = sp.make_seeded_critic_chunk(CFG, critic, tx,
                                            mesh=mesh_arg)
        sstate, losses = chunk(sstate, x_all, y_all,
                               np.ones(2, bool), idx, ck)
        return (jax.tree.map(np.asarray, sstate.params),
                np.asarray(losses))

    p_plain, l_plain = run(None)
    p_mesh, l_mesh = run(mesh)
    # sharded vs unsharded compilations reassociate the f32 loss/grad
    # reductions; 2 compounding Adam steps amplify that to ~2e-4
    # relative (same magnitude test_distributed.py accepts per step)
    np.testing.assert_allclose(l_mesh, l_plain, rtol=5e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_plain)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


def test_eval_seeds_matches_host_iou(setup):
    critic, masker, params, *_ = setup
    rng = np.random.default_rng(4)
    xe = rng.integers(0, 256, (10, 64, 64, 3), dtype=np.uint8)
    gt = rng.random((10, 64, 64)) > 0.5
    p = jax.tree.map(jnp.asarray,
                     {"critic": params["critic"],
                      "masker": params["masker"]})
    ious = sp.eval_seeds(critic, masker, p, jnp.asarray(xe), gt,
                         thresh=0.5, batch=4)   # batch !| n: padding
    assert ious.shape == (R,)
    for r in range(R):
        cp = _seed_slice(params["critic"], r)
        mp = _seed_slice(params["masker"], r)
        x = jnp.asarray(xe, jnp.float32) / 255.0
        _, em = critic.apply({"params": cp}, x, collect=True,
                             deterministic=True)
        z = np.asarray(masker.apply({"params": mp}, x, em))[..., 0]
        hard = z > 0.5
        inter = np.sum(hard & gt)
        union = np.sum(hard | gt)
        np.testing.assert_allclose(ious[r], inter / max(union, 1),
                                   rtol=1e-6)


def test_ensemble_iou_matches_host(setup):
    """Mean-z ensemble IoU == the host recomputation from per-seed
    soft masks."""
    critic, masker, params, *_ = setup
    rng = np.random.default_rng(5)
    xe = rng.integers(0, 256, (10, 64, 64, 3), dtype=np.uint8)
    gt = rng.random((10, 64, 64)) > 0.5
    p = jax.tree.map(jnp.asarray,
                     {"critic": params["critic"],
                      "masker": params["masker"]})
    got = sp.ensemble_iou(critic, masker, p, jnp.asarray(xe), gt,
                          thresh=0.5, batch=4)
    x = jnp.asarray(xe, jnp.float32) / 255.0
    zs = []
    for r in range(R):
        cp = _seed_slice(params["critic"], r)
        mp = _seed_slice(params["masker"], r)
        _, em = critic.apply({"params": cp}, x, collect=True,
                             deterministic=True)
        zs.append(np.asarray(masker.apply({"params": mp}, x,
                                          em))[..., 0])
    hard = np.mean(zs, axis=0) > 0.5
    want = np.sum(hard & gt) / max(np.sum(hard | gt), 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow  # full two-phase parallel training (~4 min, 1 CPU)
def test_run_parallel_e2e_synthetic(tmp_path, monkeypatch):
    """Tiny two-phase parallel run on the synthetic fixture: per-seed
    IoUs finite, ensemble IoU reported, per-seed .pt checkpoints in
    the serial-multirun layout, results.txt line appended."""
    from cgs_tpu.data.synthetic import synthetic_dataset, synthetic_eval_set
    from cgs_tpu.train.checkpoints import load_model_pt

    monkeypatch.chdir(tmp_path)
    cfg = Config(shift=4, dropout=0.0, batch_size=32, cepochs=6,
                 mepochs=1, testsize=100, high_rew_thresh=0.55,
                 low_rew_thresh=0.45, contrastive_min=5,
                 model="sp").derive()
    x, y, _ = synthetic_dataset(n_frames=1200, seed=0)
    xe, gt = synthetic_eval_set(n_frames=64, seed=99)
    results = str(tmp_path / "results.txt")
    out = sp.run_parallel(cfg, x, y, runs=2, base_seed=0,
                          x_eval=xe, gt_eval=gt,
                          results_path=results, chunk_steps=16,
                          verbose=False, save_checkpoints=True)
    assert len(out["ious"]) == 2
    assert np.isfinite(out["ious"]).all()
    assert 0.0 <= out["mean"] <= 1.0
    assert 0.0 <= out["ensemble_iou"] <= 1.0
    assert out["critic_losses"].shape[0] == 2
    assert np.isfinite(out["critic_losses"]).all()
    assert np.isfinite(out["masker_losses"]).all()
    with open(results) as fp:
        line = fp.read()
    assert "seed-parallel" in line and "mean=" in line \
        and "ensemble=" in line

    # per-seed checkpoints: serial-multirun run-name convention,
    # loadable, distinct across seeds, critic = PHASE-1 (the
    # never-persist-live-critic quirk is exercised by construction:
    # the default-live run trains the critic in phase 2)
    import dataclasses
    got = {}
    for r in range(2):
        cfg_r = dataclasses.replace(cfg, model=f"sp-seed{r}").derive()
        from cgs_tpu.train.checkpoints import checkpoint_paths
        paths = checkpoint_paths(cfg_r)
        c = load_model_pt("critic", paths["critic"])
        m = load_model_pt("masker", paths["masker"])
        assert c is not None and m is not None
        got[r] = (c, m)
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    assert not np.array_equal(leaf(got[0][0]), leaf(got[1][0]))
    assert not np.array_equal(leaf(got[0][1]), leaf(got[1][1]))
    # the saved critic differs from the final (live-updated) one
    final_c0 = jax.tree.map(lambda a: np.asarray(a[0]),
                            out["params"]["critic"])
    assert not np.array_equal(leaf(got[0][0]), leaf(final_c0))


@pytest.mark.slow  # two-phase frozen run (~3 min, 1 CPU)
def test_run_parallel_e2e_frozen(tmp_path, monkeypatch):
    """-frozen through the parallel driver: with the critic constant
    in phase 2 it is NOT in the trained set, yet the first donated
    mchunk call deletes the pre-phase param buffers — eval must read
    the output state's pass-through copy, not the deleted input
    (regression: RuntimeError 'Array has been deleted' at
    eval_seeds)."""
    from cgs_tpu.data.synthetic import synthetic_dataset, synthetic_eval_set

    monkeypatch.chdir(tmp_path)
    cfg = Config(shift=4, dropout=0.0, batch_size=32, cepochs=6,
                 mepochs=1, testsize=100, high_rew_thresh=0.55,
                 low_rew_thresh=0.45, contrastive_min=5,
                 frozen=True, model="spf").derive()
    x, y, _ = synthetic_dataset(n_frames=1200, seed=0)
    xe, gt = synthetic_eval_set(n_frames=64, seed=99)
    out = sp.run_parallel(cfg, x, y, runs=2, base_seed=0,
                          x_eval=xe, gt_eval=gt,
                          results_path=None, chunk_steps=16,
                          verbose=False, save_checkpoints=False)
    assert np.isfinite(out["ious"]).all()
    assert np.isfinite(out["masker_losses"]).all()
    # frozen: the critic is excluded from the phase-2 trained set and
    # the returned pass-through copy must be live and readable
    assert "critic" not in trained_param_keys(cfg)
    for leaf in jax.tree.leaves(
            jax.tree.map(np.asarray, out["params"]["critic"])):
        assert np.isfinite(leaf).all()


@pytest.mark.xfail(
    strict=False,
    reason="jax 0.9.0 GSPMD miscompiles batch-sharded "
           "vmap(conv_general_dilated) with VALID window == input "
           "extent (the 4x4 bottleneck); seed_parallel._seed_jit works "
           "around it with shard_map. If this XPASSes after a jax "
           "upgrade, the partitioner is fixed and the workaround can "
           "be retired.")
def test_gspmd_vmapped_valid_conv_canary():
    mesh = make_mesh(n_data=8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    seed_sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((8, 4, 4, 16, 32))
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 4, 16))
                    .astype(np.float32))

    def conv(wr, xr):
        return jax.lax.conv_general_dilated(
            xr, wr, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    vconv = jax.vmap(conv)
    meshed = np.asarray(jax.jit(
        vconv, in_shardings=(seed_sh, seed_sh))(w, x))
    serial = np.stack([np.asarray(jax.jit(conv)(w[r], x[r]))
                       for r in range(8)])
    np.testing.assert_allclose(meshed, serial, rtol=1e-5, atol=1e-5)


def test_eval_seeds_separate_uses_sepcrit_embeds(setup):
    """-separate eval parity: the masker must read the sepcrit's
    embeds (pipeline.py:140-144 / main.py:946-947), not the live
    critic's."""
    critic, masker, params, *_ = setup
    rng = np.random.default_rng(6)
    xe = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    gt = rng.random((6, 64, 64)) > 0.5
    # a distinct sepcrit tree (different init)
    sep = Critic(dropout=0.0).init(
        {"params": jax.random.PRNGKey(99)},
        jnp.zeros((1, 64, 64, 3)), collect=True)["params"]
    sep = jax.tree.map(lambda a: jnp.broadcast_to(a, (R,) + a.shape),
                       sep)
    p = jax.tree.map(jnp.asarray,
                     {"critic": params["critic"],
                      "masker": params["masker"]})
    p_sep = {**p, "sepcrit": sep}
    got = sp.eval_seeds(critic, masker, p_sep, jnp.asarray(xe), gt,
                        thresh=0.5, batch=6)
    x = jnp.asarray(xe, jnp.float32) / 255.0
    for r in range(R):
        _, em = critic.apply(
            {"params": jax.tree.map(lambda a: a[r], sep)}, x,
            collect=True, deterministic=True)
        z = np.asarray(masker.apply(
            {"params": _seed_slice(params["masker"], r)}, x,
            em))[..., 0]
        hard = z > 0.5
        want = np.sum(hard & gt) / max(np.sum(hard | gt), 1)
        np.testing.assert_allclose(got[r], want, rtol=1e-6)
    # and it must differ from the critic-embeds eval (wrong features)
    wrong = sp.eval_seeds(critic, masker, p, jnp.asarray(xe), gt,
                          thresh=0.5, batch=6)
    assert not np.allclose(got, wrong)


@pytest.mark.slow  # contrastive sweep + eval over sharded params (~3.5 min)
def test_sweep_and_eval_handle_seed_sharded_params(setup):
    """Regression for the GSPMD-bug defense (_unshard): params left
    P('data')-sharded by a meshed training chunk must give the same
    sweep preds and eval IoUs as local params — NOT the partitioner's
    miscompiled forward."""
    critic, _, _, x_all, y_all, _ = setup
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(n_data=8)
    masker = UnetDecoder()
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(8, dtype=np.uint32))
    params = jax.tree.map(
        np.asarray, sp.init_seed_params(critic, masker, keys))
    sharded = jax.device_put(params, NamedSharding(mesh, P("data")))

    local_preds = sp.seeded_sweep(
        critic, jax.tree.map(jnp.asarray, params["critic"]), x_all, 32)
    sharded_preds = sp.seeded_sweep(critic, sharded["critic"], x_all,
                                    32)
    np.testing.assert_allclose(sharded_preds, local_preds, rtol=1e-5,
                               atol=1e-6)

    rng = np.random.default_rng(7)
    xe = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3),
                                  dtype=np.uint8))
    gt = rng.random((8, 64, 64)) > 0.5
    p_local = jax.tree.map(jnp.asarray, {"critic": params["critic"],
                                         "masker": params["masker"]})
    p_shard = {"critic": sharded["critic"], "masker": sharded["masker"]}
    np.testing.assert_allclose(
        sp.eval_seeds(critic, masker, p_shard, xe, gt, thresh=0.5),
        sp.eval_seeds(critic, masker, p_local, xe, gt, thresh=0.5),
        rtol=1e-6)
    np.testing.assert_allclose(
        sp.ensemble_iou(critic, masker, p_shard, xe, gt, thresh=0.5),
        sp.ensemble_iou(critic, masker, p_local, xe, gt, thresh=0.5),
        rtol=1e-6)


def test_build_models_respects_cfg():
    """--chfak/--neck/--bf16 must flow into the trained architecture
    (the checkpoint fingerprints encode chfak — a mismatch ships
    unloadable checkpoints)."""
    cfg = Config(chfak=2, neck=64, bf16=True, dropout=0.1).derive()
    critic, masker = sp._build_models(cfg)
    assert critic.chfak == 2 and critic.bottleneck == 64
    assert critic.dropout == 0.1
    assert masker.chfak == 2 and masker.bottleneck == 64
    assert critic.compute_dtype == jnp.bfloat16
    assert masker.compute_dtype == jnp.bfloat16


def test_sweep_batch_scales_with_width():
    """The contrastive sweep folds the seed axis into conv channels,
    so its HBM footprint is batch*R*chfak — the batch must shrink as
    width grows (the fixed 4096 at chfak=5/R=10 was a 26.8 GB
    allocation on a 16 GB v5e)."""
    from cgs_tpu.models.critic import Critic

    c1 = Critic(bottleneck=32, chfak=1)
    c5 = Critic(bottleneck=32, chfak=5)
    # chfak=1 keeps the proven working point
    assert sp._sweep_batch(c1, 10) == 4096
    # chfak=5/R=10 must hold batch*R*chfak <= 4096*10, 256-aligned
    b5 = sp._sweep_batch(c5, 10)
    assert 256 <= b5 < 4096 and b5 % 256 == 0
    assert b5 * 10 * 5 <= 4096 * 10
    # never below the floor, never above the cap
    assert sp._sweep_batch(c5, 64) == 256
    assert sp._sweep_batch(c1, 1) == 4096
    # seeded_sweep derives R from the params tree when batch is None
    params = {"kernel": np.zeros((10, 3))}
    runs = jax.tree.leaves(params)[0].shape[0]
    assert sp._sweep_batch(c5, int(runs)) == b5


def test_pop_runs_shared_parsing():
    from cgs_tpu.sandbox.multirun import pop_runs
    argv = ["--model", "m", "--runs", "7", "-train"]
    assert pop_runs(argv) == 7
    assert argv == ["--model", "m", "-train"]
    assert pop_runs(["--model", "m"]) == 1
    with pytest.raises(SystemExit):
        pop_runs(["--model", "m", "--runs"])
    # the `--runs=N` spelling must not fall through to the dead Config
    # flag and silently train one seed (ADVICE r4)
    argv = ["--model", "m", "--runs=5", "-train"]
    assert pop_runs(argv) == 5
    assert argv == ["--model", "m", "-train"]


def test_chunk_steps_cli_validation():
    """--chunk-steps 0 / negative must fail fast with a clear message,
    not crash deep in run_parallel or silently skip training
    (ADVICE r4)."""
    import cgs_tpu.sandbox.seed_parallel as sp

    for bad in ("0", "-5"):
        with pytest.raises(SystemExit, match="chunk-steps"):
            sp.main(["--chunk-steps", bad, "-synthetic_data"])


def test_chunk_steps_cli_threads_to_run_parallel(monkeypatch):
    """`--chunk-steps` is the single-chip HBM headroom knob (module
    docstring: R=30 @ 100 steps OOMs a 16 GB v5e at the 40k protocol)
    — pin that the driver-level flag reaches run_parallel and never
    leaks into the Config grammar."""
    import cgs_tpu.sandbox.seed_parallel as sp

    seen = {}

    def fake_run_parallel(cfg, x, y, runs, **kw):
        seen["chunk_steps"] = kw.get("chunk_steps")
        seen["runs"] = runs
        return {}

    monkeypatch.setattr(sp, "run_parallel", fake_run_parallel)
    monkeypatch.setattr("cgs_tpu.data.collect.collect_data",
                        lambda cfg: (np.zeros((4, 64, 64, 3), np.uint8),
                                     np.zeros((7, 4), np.float32),
                                     np.zeros(4, np.uint16)))
    monkeypatch.setattr(
        "cgs_tpu.data.synthetic.synthetic_eval_set",
        lambda **kw: (np.zeros((200, 64, 64, 3), np.uint8),
                      np.zeros((200, 64, 64), bool)))
    sp.main(["--model", "m", "--runs", "3", "--chunk-steps", "7",
             "-synthetic_data"])
    assert seen == {"chunk_steps": 7, "runs": 3}


def test_masked_tail_chunk_is_identity_padding(setup):
    """The fixed-shape tail contract (ADVICE r3): a chunk padded with
    garbage steps and valid=False must end in EXACTLY the state of the
    serial ragged chunk over the valid prefix — params, opt state,
    step counter, and zero loss rows for the padding. shift=0 config:
    per-step keys come from split(key, S_total), so a ragged serial
    chunk draws DIFFERENT shift keys — the identity comparison is
    defined where no keys are consumed (the drivers' RNG streams are
    a documented deviation either way, module docstring)."""
    cfg0 = Config(shift=0, dropout=0.0, batch_size=8).derive()
    critic, masker, params, x_all, y_all, ck = setup
    rng = np.random.default_rng(7)
    s_valid, s_total = 2, 5
    idx = rng.integers(0, 32, (R, s_total, 8)).astype(np.int32)
    valid = np.arange(s_total) < s_valid

    tx = make_optimizer()
    sstate = sp.init_seed_state(
        {"critic": jax.tree.map(jnp.asarray, params["critic"])}, tx)
    cchunk = sp.make_seeded_critic_chunk(cfg0, critic, tx)
    sstate, vlosses = cchunk(sstate, x_all, y_all, valid, idx, ck)
    vlosses = np.asarray(vlosses)
    np.testing.assert_array_equal(vlosses[:, s_valid:], 0.0)
    assert np.asarray(sstate.step).tolist() == [s_valid] * R

    serial = make_critic_chunk(cfg0, critic, make_optimizer())
    for r in range(R):
        st = init_train_state(
            {"critic": _seed_slice(params["critic"], r)},
            make_optimizer())
        st, losses = serial(st, x_all, y_all,
                            jnp.asarray(idx[r, :s_valid]),
                            jnp.asarray(ck[r]))
        np.testing.assert_allclose(np.asarray(losses),
                                   vlosses[r, :s_valid],
                                   rtol=1e-5, atol=1e-6)
        for pv, ps in zip(jax.tree.leaves(
                jax.tree.map(np.asarray, sstate.params)),
                jax.tree.leaves(jax.tree.map(np.asarray, st.params))):
            np.testing.assert_allclose(pv[r], ps, rtol=1e-4,
                                       atol=1e-6)
