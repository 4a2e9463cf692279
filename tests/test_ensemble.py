"""--ensemble N (framework extension): MaskPipeline over stacked
per-seed params must serve the MEAN of the per-seed forwards, and the
production Handler/-process path must load the `{model}-seed{s}`
checkpoint layout that multirun/seed_parallel write (RESULTS.md: the
mean-mask ensemble measures 0.962 IoU with CRF)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cgs_tpu.core.config import Config, parse_args
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.pipeline import MaskPipeline
from cgs_tpu.sandbox import seed_parallel as sp

R = 2


@pytest.fixture(scope="module")
def stacked():
    critic, masker = Critic(), UnetDecoder()
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(R, dtype=np.uint32))
    params = jax.tree.map(
        np.asarray, sp.init_seed_params(critic, masker, keys))
    return critic, masker, {"critic": params["critic"],
                            "masker": params["masker"]}


def test_ensemble_pipeline_is_mean_of_members(stacked, rng):
    critic, masker, params = stacked
    frames = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    epipe = MaskPipeline(critic, masker,
                         jax.tree.map(jnp.asarray, params),
                         batch_size=6, salience=True, ensemble=True)
    out = epipe.run(frames)

    singles = []
    for r in range(R):
        p = jax.tree.map(lambda a: jnp.asarray(a[r]), params)
        pipe = MaskPipeline(critic, masker, p, batch_size=6,
                            salience=True)
        singles.append(pipe.run(frames))
    np.testing.assert_allclose(
        out.preds, np.mean([s.preds for s in singles], axis=0),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        out.masks, np.mean([s.masks for s in singles], axis=0),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        out.saliency, np.mean([s.saliency for s in singles], axis=0),
        rtol=1e-4, atol=1e-7)


@pytest.mark.slow  # meshed-vs-unmeshed ensemble forward (~50 s, 1 CPU)
def test_seed_sharded_ensemble_matches_unmeshed(rng):
    """ensemble + mesh => seed-per-device shard_map (pipeline.py):
    R=4 members over a 2-wide 'data' axis (2 local seeds per device,
    local vmap + one pmean) must reproduce the unmeshed vmapped
    ensemble; non-divisible R is rejected loudly."""
    from cgs_tpu.parallel.mesh import make_mesh

    critic, masker = Critic(), UnetDecoder()
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(4, dtype=np.uint32))
    params = jax.tree.map(
        np.asarray, sp.init_seed_params(critic, masker, keys))
    params = {"critic": params["critic"], "masker": params["masker"]}
    frames = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)

    ref = MaskPipeline(critic, masker, params, batch_size=6,
                       salience=True, ensemble=True).run(frames)
    meshed = MaskPipeline(critic, masker, params, batch_size=6,
                          salience=True, ensemble=True,
                          mesh=make_mesh(n_data=2)).run(frames)
    np.testing.assert_allclose(meshed.preds, ref.preds,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(meshed.masks, ref.masks,
                               rtol=1e-6, atol=1e-7)
    # input-grads of a random-init (sigmoid-saturated) critic are
    # ~1e-6 — absolute f32 accumulation noise from the different conv
    # grouping (4- vs 2-seed local vmap) dominates relative error
    np.testing.assert_allclose(meshed.saliency, ref.saliency,
                               atol=3e-5)

    with pytest.raises(ValueError, match="R % n_data"):
        MaskPipeline(critic, masker, params, batch_size=6,
                     ensemble=True, mesh=make_mesh(n_data=3))

    # multi-chunk host path: batch 4 over 6 frames -> 2 dispatches,
    # the second padded; replicated input placement + unpadding must
    # compose with the seed-sharded forward
    chunked = MaskPipeline(critic, masker, params, batch_size=4,
                           salience=True, ensemble=True,
                           mesh=make_mesh(n_data=2)).run(frames)
    np.testing.assert_allclose(chunked.masks, ref.masks,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(chunked.preds, ref.preds,
                               rtol=1e-6, atol=1e-7)


def test_process_cli_with_ensemble(tmp_path, monkeypatch, stacked, rng):
    """-process --ensemble 2 loads {model}-seed{0,1} checkpoints and
    writes mean-mask outputs through the production Handler path."""
    from cgs_tpu.handler import Handler
    from cgs_tpu.train.checkpoints import checkpoint_paths, save_model_pt

    critic, masker, params = stacked
    monkeypatch.chdir(tmp_path)
    base = ["-process", "--model", "m", "--ensemble", "2",
            "--infer-batch", "8", "--dropout", "0",
            "--source-imgs", "imgs", "--mask-output-imgs", "out"]
    cfg = parse_args(base)
    assert cfg.ensemble == 2
    for s in range(R):
        cfg_s = dataclasses.replace(cfg, model=f"m-seed{s}").derive()
        paths = checkpoint_paths(cfg_s)
        take = lambda t: jax.tree.map(lambda a: np.asarray(a[s]), t)
        save_model_pt(take(params["critic"]), "critic",
                      paths["critic"])
        save_model_pt(take(params["masker"]), "masker",
                      paths["masker"])

    os.makedirs("imgs")
    frames = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(f"imgs/f{i}.png")

    h = Handler(cfg)
    h.segment("imgs")
    outs = sorted(os.listdir("out"))
    assert any("raw-mask" in f for f in outs), outs

    # the written raw mask == the stacked-pipeline mean mask
    epipe = MaskPipeline(critic, masker,
                         jax.tree.map(jnp.asarray, params),
                         batch_size=8, ensemble=True)
    want = epipe.run(frames).masks[0, :, :, 0]
    got = np.asarray(Image.open("out/f0-raw-mask.png"),
                     np.float32)[..., 0] / 255.0
    np.testing.assert_allclose(got, want, atol=1 / 255.0 + 1e-6)
    h.close()

    # --data-parallel 2: the production path flips to the
    # seed-sharded pipeline (seed-per-device) — identical outputs
    cfg_dp = parse_args(base + ["--data-parallel", "2",
                                "--mask-output-imgs", "out-dp"])
    h2 = Handler(cfg_dp)
    assert h2._pipeline(False).mesh is not None  # actually seed-sharded
    h2.segment("imgs")
    got_dp = np.asarray(Image.open("out-dp/f0-raw-mask.png"),
                        np.float32)[..., 0] / 255.0
    # float-assoc differences may flip an 8-bit quantization bucket
    np.testing.assert_allclose(got_dp, got, atol=1 / 255.0 + 1e-6)
    h2.close()


def test_ensemble_mesh_eligibility(capsys):
    """ensemble_mesh_or_none: the one-site seed-sharding rule —
    divisible R keeps the mesh, non-divisible warns and drops it."""
    from cgs_tpu.parallel.mesh import ensemble_mesh_or_none, make_mesh

    mesh = make_mesh(n_data=2)
    assert ensemble_mesh_or_none(None, 4) is None
    assert ensemble_mesh_or_none(mesh, 4) is mesh
    assert ensemble_mesh_or_none(mesh, 3) is None
    assert "N % n_data" in capsys.readouterr().out


def test_serve_seed_sharded_ensemble(tmp_path, monkeypatch, stacked,
                                     rng):
    """--ensemble 2 --data-parallel 2 serving: the batcher dispatches
    through the seed-sharded pipeline and serves the same mask as the
    unmeshed ensemble."""
    from cgs_tpu.serve import MaskServer
    from cgs_tpu.train.checkpoints import checkpoint_paths, save_model_pt

    critic, masker, params = stacked
    monkeypatch.chdir(tmp_path)
    cfg = parse_args(["--infer-batch", "8", "--serve-wait-ms", "5",
                      "--dropout", "0", "--ensemble", "2",
                      "--data-parallel", "2", "--model", "m"])
    for s in range(R):
        cfg_s = dataclasses.replace(cfg, model=f"m-seed{s}").derive()
        paths = checkpoint_paths(cfg_s)
        take = lambda t: jax.tree.map(lambda a: np.asarray(a[s]), t)
        save_model_pt(take(params["critic"]), "critic",
                      paths["critic"])
        save_model_pt(take(params["masker"]), "masker",
                      paths["masker"])
    srv = MaskServer(cfg)
    try:
        assert srv.pipe.mesh is not None and srv.pipe.ensemble
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        served = srv.batcher.submit(frame).mask
        epipe = MaskPipeline(critic, masker,
                             jax.tree.map(jnp.asarray, params),
                             batch_size=8, ensemble=True)
        want = epipe.run(frame[None]).masks[0, :, :, 0]
        np.testing.assert_allclose(served, want, atol=1e-6)
    finally:
        srv.batcher.close()


def test_ensemble_rejects_separate(tmp_path, monkeypatch):
    from cgs_tpu.train.checkpoints import load_seed_ensemble

    monkeypatch.chdir(tmp_path)
    cfg = Config(separate=True, ensemble=2, model="m").derive()
    with pytest.raises(ValueError, match="sepcrit"):
        load_seed_ensemble(cfg, 2)


def test_ensemble_missing_member_is_loud(tmp_path, monkeypatch):
    from cgs_tpu.train.checkpoints import load_seed_ensemble

    monkeypatch.chdir(tmp_path)
    cfg = Config(ensemble=2, model="m").derive()
    with pytest.raises(FileNotFoundError, match="m-seed0"):
        load_seed_ensemble(cfg, 2)


def test_serve_ensemble(tmp_path, monkeypatch, stacked, rng):
    """--ensemble serving: the served mask == the stacked-pipeline
    mean; /reload refreshes all members or none."""
    from cgs_tpu.serve import MaskServer
    from cgs_tpu.train.checkpoints import checkpoint_paths, save_model_pt

    critic, masker, params = stacked
    monkeypatch.chdir(tmp_path)
    cfg = parse_args(["--infer-batch", "8", "--serve-wait-ms", "5",
                      "--dropout", "0", "--ensemble", "2",
                      "--model", "m"])
    for s in range(R):
        cfg_s = dataclasses.replace(cfg, model=f"m-seed{s}").derive()
        paths = checkpoint_paths(cfg_s)
        take = lambda t: jax.tree.map(lambda a: np.asarray(a[s]), t)
        save_model_pt(take(params["critic"]), "critic",
                      paths["critic"])
        save_model_pt(take(params["masker"]), "masker",
                      paths["masker"])

    srv = MaskServer(cfg)
    try:
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        served = srv.batcher.submit(frame).mask
        epipe = MaskPipeline(critic, masker,
                             jax.tree.map(jnp.asarray, params),
                             batch_size=8, ensemble=True)
        want = epipe.run(frame[None]).masks[0, :, :, 0]
        np.testing.assert_allclose(served, want, atol=1e-6)

        # perturb member 0's masker on disk -> reload -> mask changes
        cfg0 = dataclasses.replace(cfg, model="m-seed0").derive()
        new = jax.tree.map(lambda a: np.asarray(a[0]) + 0.2,
                           params["masker"])
        save_model_pt(new, "masker", checkpoint_paths(cfg0)["masker"])
        assert srv.reload_checkpoints() == {"ensemble": True}
        after = srv.batcher.submit(frame).mask
        assert np.abs(after - served).max() > 1e-4

        # a missing member keeps the served weights (all-or-nothing)
        os.remove(checkpoint_paths(cfg0)["masker"])
        assert srv.reload_checkpoints() == {"ensemble": False}
        keep = srv.batcher.submit(frame).mask
        np.testing.assert_allclose(keep, after, atol=1e-7)
    finally:
        srv.batcher.close()


def test_ensemble_rejects_training_modes():
    with pytest.raises(ValueError, match="inference-only"):
        parse_args(["-train", "--ensemble", "2", "--model", "m"])
    # -test with the (non-disableable) cload default leaves
    # train=False — eval-only, so ensemble is legitimate there
    cfg = parse_args(["-test", "--ensemble", "2", "--model", "m"])
    assert cfg.eval and not cfg.train
    assert parse_args(["-eval", "--ensemble", "2",
                       "--model", "m"]).ensemble == 2


def test_ensemble_reload_survives_corrupt_member(tmp_path, monkeypatch,
                                                 stacked, rng):
    """A member .pt caught mid-overwrite (corrupt zip) must keep the
    served weights, not 500 (the non-ensemble path's contract)."""
    from cgs_tpu.serve import MaskServer
    from cgs_tpu.train.checkpoints import checkpoint_paths, save_model_pt

    critic, masker, params = stacked
    monkeypatch.chdir(tmp_path)
    cfg = parse_args(["--infer-batch", "8", "--serve-wait-ms", "5",
                      "--dropout", "0", "--ensemble", "2",
                      "--model", "m"])
    for s in range(R):
        cfg_s = dataclasses.replace(cfg, model=f"m-seed{s}").derive()
        paths = checkpoint_paths(cfg_s)
        take = lambda t: jax.tree.map(lambda a: np.asarray(a[s]), t)
        save_model_pt(take(params["critic"]), "critic",
                      paths["critic"])
        save_model_pt(take(params["masker"]), "masker",
                      paths["masker"])
    srv = MaskServer(cfg)
    try:
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        before = srv.batcher.submit(frame).mask
        cfg0 = dataclasses.replace(cfg, model="m-seed0").derive()
        with open(checkpoint_paths(cfg0)["masker"], "wb") as fp:
            fp.write(b"truncated-mid-write")
        assert srv.reload_checkpoints() == {"ensemble": False}
        after = srv.batcher.submit(frame).mask
        np.testing.assert_allclose(after, before, atol=1e-7)
    finally:
        srv.batcher.close()
