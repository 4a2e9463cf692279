"""Orchestrator (rebuild of the reference `Handler`, main.py:66-1270).

Owns models/params, run-directory layout, checkpoint fingerprints, and
the phase drivers:

    load_data -> critic_pipe -> segmentation_training -> eval /
    segment / visualize

Run layout parity (main.py:93-102): `{name}/saves/critic-<args>.pt`,
`{name}/saves/masker-<args>.pt`, results under `{name}/critic/` and
`{name}/segment/`, eval artifacts under `eval-results/{name}/`.

TPU execution model: datasets are device-resident; each `visevery`
window of optimizer steps is ONE compiled scan program
(cgs_tpu/train/loops.py); host work is only index generation, PNG/video
artifacts, and checkpoint IO.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.data.collect import collect_data
from cgs_tpu.data.loader import DataBundle, EpochLoader
from cgs_tpu.eval.harness import evaluate, load_eval_set
from cgs_tpu.eval.segment import VIDEO_EXTS, segment_folder
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.parallel.mesh import (
    index_sharding, local_mesh_or_none, replicate_tree,
    replicated_sharding,
)
from cgs_tpu.parallel.multihost import is_primary
from cgs_tpu.pipeline import MaskPipeline
from cgs_tpu.train.checkpoints import (
    checkpoint_paths, load_model_pt, save_model_pt)
from cgs_tpu.train.contrastive import (
    extract_contrastive_sets, sample_index_stacks,
)
from cgs_tpu.train.loops import (
    make_critic_chunk, make_critic_viz_fn, make_masker_chunk,
    make_masker_viz_fn,
)
from cgs_tpu.train.steps import (
    init_train_state, make_optimizer, trained_param_keys,
)
from cgs_tpu.utils.artifacts import (
    annotate_strip, save_histogram, save_loss_plot,
)
from cgs_tpu.utils.metrics import MetricsWriter, write_log_header
from cgs_tpu.utils.profiling import Profiler, nan_guard

CRITIC = "critic"
MASKER = "masker"
SEPCRIT = "sepcrit"


class Handler:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.mesh = local_mesh_or_none(cfg)
        self.primary = is_primary()  # host 0 owns artifacts/ckpts
        self.ious = (0.0, 0.0)      # best-so-far tracker (main.py:77)
        self.last_ious: List[float] = []  # most recent eval() result
        # (framework field: the reference tracker above deliberately
        # never updates from eval(), matching main.py:1018 — callers
        # like sandbox.multirun need the actual score)
        self.bestepoch = 0

        # models + params (--bf16: bfloat16 conv stacks, f32 params
        # and sigmoid heads; hard-mask IoU vs f32 measured 1.0 at the
        # 0.05 eval threshold)
        cdt = jnp.bfloat16 if cfg.bf16 else jnp.float32
        self.critic = Critic(bottleneck=cfg.neck, chfak=cfg.chfak,
                             dropout=cfg.dropout, compute_dtype=cdt)
        self.masker = UnetDecoder(bottleneck=cfg.neck, chfak=cfg.chfak,
                                  compute_dtype=cdt)
        self.reset_models()

        # run layout (main.py:93-102)
        self.path = f"{cfg.name}/"
        self.save_path = self.path + "saves/"
        self.save_paths = checkpoint_paths(cfg)
        self.metrics = MetricsWriter(self.path, enabled=self.primary)
        self.profiler = Profiler(cfg.profile or None)
        self.data: Optional[DataBundle] = None
        self.contrastive = None
        self._pipes: Dict = {}       # compiled inference pipelines
        self._eval_sets: Dict = {}   # folder -> (x, gt) eval data
        self._ensemble_params = None  # --ensemble stacked tree cache

    # -- model/param management ------------------------------------

    def _next_key(self):
        """Per-dispatch RNG key. The key CHAIN stays host-local and
        per-process deterministic (same seed -> same chain on every
        process); each dispatched key is re-placed as a global
        replicated array when meshed."""
        self.key, k = jax.random.split(self.key)
        if self.mesh is not None:
            return replicate_tree(self.mesh, k)
        return k

    def _replicate(self, tree):
        """Place a pytree replicated over the DP mesh (identity with
        no mesh) — parallel/mesh.py:replicate_tree holds the
        single/multi-process placement rules."""
        if self.mesh is None:
            return tree
        return replicate_tree(self.mesh, tree)

    def _put_idx(self, idx) -> jnp.ndarray:
        """Ship a (steps, batch) index stack; over a mesh the batch
        axis is sharded on 'data' when divisible, replicated
        otherwise (parallel/mesh.py:index_sharding — must agree with
        the chunk jit's in_shardings)."""
        if self.mesh is None:
            return jnp.asarray(idx)
        idx = np.asarray(idx)
        return jax.device_put(idx,
                              index_sharding(self.mesh, idx.shape[1]))

    def _sync_params(self, state) -> None:
        """Copy EVERY param sub-tree (trained AND pass-through) from
        the train state back into self.params. The chunk jits donate
        the state (donate_argnums), which deletes the old buffers —
        including un-trained pass-through leaves (e.g. the critic in
        -frozen mode) that self.params still references on a
        single-device run; syncing only the trained keys would leave
        self.params holding deleted arrays."""
        for name in state.params:
            self.params[name] = state.params[name]

    def reset_models(self) -> None:
        """Fresh params (main.py:106-111). Initialization runs on the
        host CPU backend — remote-compiling the tiny init programs
        through a TPU tunnel costs ~45 s for nothing; params migrate
        to the accelerator on first real use. local_devices, not
        devices: in a multi-process run devices("cpu")[0] can be
        another host's device."""
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            x0 = jnp.zeros((2, 64, 64, 3))
            k1, k2, k3 = jax.random.split(
                jax.random.PRNGKey(self.cfg.seed), 3)
            cparams = self.critic.init({"params": k1}, x0,
                                       collect=True)["params"]
            _, embeds = self.critic.apply({"params": cparams}, x0,
                                          collect=True)
            mparams = self.masker.init({"params": k2}, x0,
                                       embeds)["params"]
            self.params: Dict = {CRITIC: cparams, MASKER: mparams}
            if self.cfg.separate:
                self.params[SEPCRIT] = self.critic.init(
                    {"params": k3}, x0, collect=True)["params"]

    def load_models(self, modelnames: Optional[List[str]] = None) -> bool:
        """.pt checkpoint load; False if any file is missing
        (main.py:136-147).

        Multi-host: host 0's filesystem decides and its values are
        broadcast — checkpoints are written by host 0 only, so local
        disks can disagree, and a divergent cload short-circuit would
        leave some hosts inside SPMD collectives the others never
        dispatch (deadlock)."""
        modelnames = modelnames or list(self.params.keys())
        if jax.process_count() == 1:
            return self._load_models_local(modelnames)
        from jax.experimental import multihost_utils
        ok = self._load_models_local(modelnames) if self.primary \
            else False
        ok = bool(multihost_utils.broadcast_one_to_all(
            np.int32(ok)))
        # broadcast host 0's values even on the False path:
        # _load_models_local mutates self.params model-by-model before
        # discovering a later checkpoint is missing (reference quirk,
        # main.py:136-147), so host 0 can hold a partial load while
        # the others hold random init — later replicate_tree calls
        # would then build 'replicated' arrays that silently differ
        # across processes
        for name in modelnames:
            self.params[name] = jax.tree.map(
                np.asarray, multihost_utils.broadcast_one_to_all(
                    jax.tree.map(np.asarray, self.params[name])))
        return ok

    def _load_models_local(self, modelnames: List[str]) -> bool:
        for name in modelnames:
            loaded = load_model_pt(name, self.save_paths[name])
            if loaded is None:
                if not self.cfg.train:
                    print(f"{self.save_paths[name]} not found")
                return False
            print("loading:", self.save_paths[name])
            self.params[name] = loaded
        return True

    def save_models(self, modelnames: Optional[List[str]] = None) -> None:
        if not self.primary:      # host 0 owns checkpoints
            return
        modelnames = modelnames or list(self.params.keys())
        for name in modelnames:
            print("saving:", self.save_paths[name])
            save_model_pt(jax.tree.map(np.asarray, self.params[name]),
                          name, self.save_paths[name])

    # -- data --------------------------------------------------------

    def load_data(self) -> None:
        """collect -> split -> device (main.py:113-134). Over a DP
        mesh the frame banks are replicated per chip; the per-step
        index stacks are what gets sharded (parallel/mesh.py)."""
        x, y, i = collect_data(self.cfg)
        self.data = DataBundle.from_arrays(x, y, i, self.cfg)
        self.data.to_device(
            self.cfg,
            sharding=replicated_sharding(self.mesh)
            if self.mesh is not None else None)
        print("dataset shapes", x.shape, y.shape,
              self.data.x_train.shape, self.data.y_train.shape)

    # -- phase 1: critic ----------------------------------------------

    def critic_pipe(self, mode: str = "train") -> None:
        """Critic training (main.py:158-236). mode="test" runs exactly
        one epoch (main.py:182 `range(int(testf) or cepochs)`)."""
        cfg = self.cfg
        n_epochs = 1 if mode == "test" else cfg.cepochs
        if cfg.cload and self.load_models([CRITIC]):
            print("loaded critic, no new training")
            return

        result_path = self.path + "critic/"
        if self.primary:
            os.makedirs(result_path, exist_ok=True)
            write_log_header(result_path, cfg)
        if cfg.directeval:                    # main.py:179-180
            self.eval()

        tx = make_optimizer()
        state = self._replicate(
            init_train_state({CRITIC: self.params[CRITIC]}, tx))
        chunk_fn = make_critic_chunk(cfg, self.critic, tx,
                                     mesh=self.mesh)
        viz_fn = make_critic_viz_fn(cfg, self.critic)
        loader = EpochLoader(self.data.n_train, cfg.batch_size,
                             self.rng)
        x_dev, y_dev = self.data.x_train_dev, self.data.y_train_dev

        # full-state resume (framework extension; the reference never
        # saves optimizer state or step, SURVEY.md §5)
        start_epoch = 0
        ckpt_mgr = None
        if cfg.orbax:
            from cgs_tpu.train.checkpoints import OrbaxManager
            ckpt_mgr = OrbaxManager(self.save_path + "orbax-critic/")
            restored = ckpt_mgr.restore(state)
            if restored is not None:
                start_epoch, state, _ = restored
                state = self._replicate(state)
                print(f"orbax resume: critic epoch {start_epoch}")

        llog: List[float] = []
        t0 = time.time()
        # --profile tracing is owned by cli.main (one trace spanning
        # BOTH phases + eval; a phase-local start/stop would miss the
        # masker phase and leak the trace on exceptions)
        for epoch in range(start_epoch, n_epochs):
            b_idx = 0
            # the critic-phase viz cadence is the reference's
            # hard-coded every-100-batches (main.py:204 `if not
            # b_idx % 100`); --visevery only drives the MASKER phase
            # (main.py:466) — so the chunk (= dispatch+viz) size here
            # is the constant 100, not cfg.visevery
            for idx in loader.chunks(100):
                with self.profiler.annotate("critic_chunk"):
                    state, losses = chunk_fn(state, x_dev, y_dev,
                                             self._put_idx(idx),
                                             self._next_key())
                losses = np.asarray(losses)
                if cfg.debug_nan:
                    nan_guard({"losses": losses,
                               "params": state.params}, "critic/")
                llog.extend(losses.tolist())
                print(f"critic e{epoch + 1} b{b_idx} "
                      f"{losses[-1]:.5f}", end="\r")
                # annotated strip at chunk boundary (main.py:204).
                # The viz COMPUTE runs on every process (a jit over a
                # multi-process mesh is SPMD — gating it on one host
                # would deadlock the others); only the file write is
                # primary-gated.
                xb, yb, pred = viz_fn(state.params, x_dev, y_dev,
                                      np.asarray(idx[0]),
                                      self._next_key())
                if self.primary:
                    annotate_strip(
                        [np.asarray(xb)],
                        [np.asarray(yb).tolist(),
                         np.asarray(pred).tolist()],
                        result_path + f"e{epoch}_b{b_idx}.png",
                        row_offset=33)
                self.metrics.write("critic_loss", step=int(state.step),
                                   loss=float(losses.mean()))
                b_idx += len(idx)

            if not (epoch + 1) % cfg.saveevery:   # main.py:228
                self.params[CRITIC] = state.params[CRITIC]
                self.save_models([CRITIC])
            if ckpt_mgr is not None:
                # NOT primary-gated: orbax CheckpointManager.save is a
                # collective in multi-process jax (it barriers across
                # hosts and writes from host 0 itself) — gating it to
                # one process would deadlock the rest
                ckpt_mgr.save(epoch + 1, state)
            if self.primary:
                save_loss_plot(result_path + "_loss.png", llog,
                               ["Train Loss"])
        if ckpt_mgr is not None:
            ckpt_mgr.wait()
        steps_total = len(llog)
        dt = time.time() - t0
        if steps_total:
            self.metrics.write("critic_throughput",
                               steps_per_sec=steps_total / dt,
                               frames_per_sec=steps_total
                               * cfg.batch_size / dt)
        print()
        self.params[CRITIC] = state.params[CRITIC]

    # -- phase 2: masker ----------------------------------------------

    def extract_contrastive_data(self):
        """Sweep + split + histogram artifacts (main.py:238-312)."""
        cfg = self.cfg
        sets = extract_contrastive_sets(
            cfg, self.critic, self._replicate(self.params[CRITIC]),
            self.data.x_train_dev,
            self.data.y_train[cfg.rewidx].astype(np.float32),
            self.rng, min_count=cfg.contrastive_min)
        if self.mesh is not None:
            # pos/neg frame banks replicate like the train banks; the
            # per-step samplers are what gets sharded
            import dataclasses as _dc
            sets = _dc.replace(
                sets, xpos=self._replicate(sets.xpos),
                ypos=self._replicate(sets.ypos),
                xneg=self._replicate(sets.xneg),
                yneg=self._replicate(sets.yneg))
        idx = cfg.rewidx
        if self.primary:
            save_histogram(self.path + f"pred_idx{idx}_hist.png",
                           sets.preds)
            save_histogram(self.path + f"GT_idx{idx}_hist.png",
                           self.data.y_train[idx])
            # count marker file (main.py:274-276)
            marker = (f"{int(sets.pos_mask.sum())}"
                      f">{cfg.high_rew_thresh}__"
                      f"{int(sets.neg_mask.sum())}"
                      f"<{cfg.low_rew_thresh}.txt")
            with open(self.path + marker, "w") as fp:
                fp.write("")
        self.contrastive = sets
        return sets

    def segmentation_training(self) -> None:
        """Masker training (main.py:314-575)."""
        cfg = self.cfg
        sets = self.extract_contrastive_data()
        train_path = self.path + "segment/"
        if self.primary:
            os.makedirs(train_path, exist_ok=True)
            write_log_header(train_path, cfg)
        if cfg.directeval:                    # main.py:337-338
            self.eval()

        tx = make_optimizer(cfg.critic_lr_scale)
        trained = trained_param_keys(cfg)
        state = self._replicate(
            init_train_state(dict(self.params), tx, trained))
        chunk_fn = make_masker_chunk(cfg, self.critic, self.masker, tx,
                                     mesh=self.mesh)
        viz_fn = make_masker_viz_fn(cfg, self.critic, self.masker)

        k = 32  # contrastive batch (main.py:309)
        steps_per_epoch = -(-sets.n_pos // k)     # main.py:342

        # Masker-phase RNG is DERIVED per (epoch, step-in-epoch), not
        # drawn from the stateful self.rng/self.key chains: a resumed
        # run then replays the exact index/shift/dropout streams of
        # the uninterrupted run with no RNG state persisted (VERDICT
        # r3 #5 — chunk-granular resume must reproduce params
        # exactly). Deterministic per seed; stream VALUES differ from
        # the r3 chain (an internal, already-documented deviation).
        key_base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), 0x6d61736b)  # 'mask'

        def chunk_rngs(epoch: int, done: int):
            crng = np.random.default_rng(np.random.SeedSequence(
                [cfg.seed, 0x6d61736b, epoch, done]))
            kk = jax.random.fold_in(
                jax.random.fold_in(key_base, epoch), done)
            kchunk, kviz = jax.random.split(kk)
            if self.mesh is not None:
                kchunk = replicate_tree(self.mesh, kchunk)
                kviz = replicate_tree(self.mesh, kviz)
            return crng, kchunk, kviz

        start_epoch = start_done = 0
        ckpt_mgr = None
        if cfg.orbax:
            from cgs_tpu.train.checkpoints import OrbaxManager
            ckpt_mgr = OrbaxManager(self.save_path + "orbax-masker/")
            restored = ckpt_mgr.restore(state)
            if restored is not None:
                # the orbax step is the GLOBAL optimizer step, saved
                # at every chunk boundary — resume lands mid-epoch
                # (steps_per_epoch is deterministic: same data, same
                # loaded critic => same contrastive split)
                gstep, state, _ = restored
                state = self._replicate(state)
                start_epoch, start_done = divmod(gstep,
                                                 steps_per_epoch)
                print(f"orbax resume: masker epoch {start_epoch} "
                      f"step {start_done}")

        log_rows: List[np.ndarray] = []
        t0 = time.time()
        for epoch in range(start_epoch, cfg.mepochs):
            done = start_done if epoch == start_epoch else 0
            while done < steps_per_epoch:
                s = min(cfg.visevery, steps_per_epoch - done)
                crng, kchunk, kviz = chunk_rngs(epoch, done)
                h, l, c = sample_index_stacks(crng, sets.n_pos,
                                              sets.n_neg, s, k)
                with self.profiler.annotate("masker_chunk"):
                    state, losses = chunk_fn(
                        state, sets.xpos, sets.ypos, sets.xneg,
                        sets.yneg, self._put_idx(h), self._put_idx(l),
                        self._put_idx(c), kchunk)
                losses = np.asarray(losses)       # (s, 4)
                if cfg.debug_nan:
                    nan_guard({"losses": losses,
                               "params": state.params}, "masker/")
                log_rows.append(losses)
                r, i, nm, cl = losses[-1]
                print(f"masker e{epoch} b{done} replace {r:.5f} "
                      f"inject {i:.5f} norm {nm:.5f} critic {cl:.5f}",
                      end="\r")
                # 7-row merge viz at chunk boundary (main.py:466) —
                # compute on every process (SPMD), write on host 0
                viz = viz_fn(state.params, sets.xpos, sets.ypos,
                             sets.xneg, sets.yneg,
                             np.asarray(h[0]), np.asarray(l[0]),
                             np.asarray(c[0][:2 * k]), kviz)
                if self.primary:
                    viz = {kk: np.asarray(v) for kk, v in viz.items()}
                    annotate_strip(
                        [np.zeros_like(viz["a"]),
                         np.zeros_like(viz["a"]),
                         viz["a"], viz["b"][:2 * k], viz["replaced"],
                         viz["injected"],
                         np.repeat(viz["z"], 3, axis=-1)],
                        [viz["y"], viz["pred"], viz["negpred"],
                         viz["replacevalue"]]
                        + ([viz["injectvalue"]] if cfg.inject else []),
                        train_path + f"e{epoch}_b{done}.png")
                self.metrics.write(
                    "masker_loss", step=int(state.step),
                    replace=float(losses[:, 0].mean()),
                    inject=float(losses[:, 1].mean()),
                    norm=float(losses[:, 2].mean()),
                    critic=float(losses[:, 3].mean()))
                done += s
                if ckpt_mgr is not None:
                    # chunk-granular (the state is already a complete
                    # snapshot here; VERDICT r3 #5 — with the default
                    # mepochs=1, epoch-boundary saves made -orbax
                    # useless against mid-phase crashes). Collective
                    # (never gate on primary; CLAUDE.md multi-process
                    # rules).
                    ckpt_mgr.save(epoch * steps_per_epoch + done,
                                  state)

            if self.primary:
                all_losses = np.concatenate(log_rows, axis=0)
                save_loss_plot(
                    train_path + "_loss.png", all_losses,
                    ["replace", "inject", "norm", "live-critic"],
                    ymin_zero=False)
            if not (epoch + 1) % cfg.saveevery:   # main.py:565
                self._sync_params(state)
                self.save_models([MASKER])
            # (orbax epoch-boundary save subsumed by the chunk-
            # granular save above: the epoch's final chunk IS the
            # boundary)
            if cfg.directeval:
                # per-epoch eval + best-IoU tracking — the sandbox's
                # live feature (TrainHandler.py:1077-1080; dead behind
                # `if False:` in main.py:568-572), surfaced here behind
                # the -directeval flag
                self._sync_params(state)
                epoch_ious = self.eval()
                if epoch_ious[0] > self.ious[0]:
                    self.ious = tuple(epoch_ious[:2]) if \
                        len(epoch_ious) > 1 else (epoch_ious[0], 0.0)
                    self.bestepoch = epoch

        if ckpt_mgr is not None:
            ckpt_mgr.wait()
        total = sum(r.shape[0] for r in log_rows)
        dt = time.time() - t0
        if total:
            self.metrics.write("masker_throughput",
                               steps_per_sec=total / dt)
        print()
        self._sync_params(state)
        self.save_models([MASKER])

    # -- eval / inference ---------------------------------------------

    def _pipeline(self, salience: bool, wire: str = "f32",
                  hard_threshold=None) -> MaskPipeline:
        """Cached per (salience, wire, hard_threshold) config: repeated
        evals (e.g. -directeval's per-epoch loop) reuse the compiled
        program and only swap params — a retrace per epoch would pay
        the remote compile every time.

        wire/hard_threshold: D2H reduction for host-fed paths
        (pipeline.py docstring; selected by Handler.segment).

        --ensemble N (framework extension): serve the MEAN of the N
        per-seed runs `{model}-seed{s}` — the checkpoints live on
        disk, so the stacked tree is loaded once and NOT refreshed
        from self.params on reuse. On a mesh with N % n_data == 0 the
        pipeline runs SEED-SHARDED (seed-per-device shard_map,
        pipeline.py — full single-model throughput per chip, one
        pmean); otherwise unmeshed, since letting GSPMD shard the
        vmapped-over-weights forward is the partitioner-bug surface
        seed_parallel._seed_jit documents."""
        ensemble = self.cfg.ensemble > 0
        cache_key = (salience, wire, hard_threshold)
        pipe = self._pipes.get(cache_key)
        if pipe is not None:
            if not ensemble:
                pipe.update_params(self.params)
            return pipe
        batch = self.cfg.infer_batch or (
            8192 if jax.default_backend() == "tpu" else 128)
        params = self.params
        mesh = self.mesh
        if ensemble:
            from cgs_tpu.train.checkpoints import load_seed_ensemble
            if self._ensemble_params is None:  # once per Handler, not
                # per (salience,) cache entry — 2N torch.loads each
                self._ensemble_params = load_seed_ensemble(
                    self.cfg, self.cfg.ensemble)
            params = self._ensemble_params
            from cgs_tpu.parallel.mesh import ensemble_mesh_or_none
            mesh = ensemble_mesh_or_none(mesh, self.cfg.ensemble)
        pipe = MaskPipeline(
            self.critic, self.masker, params,
            batch_size=batch,
            salience=salience,
            eval_mode=not self.cfg.noevalmode,   # main.py:900-909
            separate=self.cfg.separate and not ensemble,
            seed=self.cfg.seed,
            mesh=mesh,
            ensemble=ensemble,
            wire=wire,
            hard_threshold=hard_threshold)
        self._pipes[cache_key] = pipe
        return pipe

    def _crf_fn(self):
        if not self.cfg.crf:
            return None
        try:
            from cgs_tpu.eval.crf import DenseCRF
            return DenseCRF(rescale=self.cfg.crf_rescale)
        except Exception as e:
            print(f"[cgs-tpu] CRF unavailable ({e}); skipping "
                  "refinement (the reference ships with its pydensecrf "
                  "import commented out, main.py:8,23)")
            return None

    def eval(self, folder: str = "") -> List[float]:
        """IoU eval (main.py:891-1101); with `folder`, evaluates a
        directory of images against an all-zero GT (reference
        main.py:917-918 semantics)."""
        cfg = self.cfg
        out_dir = f"eval-results/{cfg.name}/"
        if folder not in self._eval_sets:
            self._eval_sets[folder] = load_eval_set(
                cfg, evaldatapath=cfg.evaldatapath, folder=folder)
        x, gt = self._eval_sets[folder]
        pipe = self._pipeline(salience=cfg.salience)
        # every host runs the identical SPMD compute on the identical
        # data; write=False gates only host artifacts (cfg mutation
        # would change WHAT non-primary hosts evaluate — resimages
        # also selects the data source in load_eval_set)
        result = evaluate(cfg, pipe, x, gt, crf_fn=self._crf_fn(),
                          best_iou=self.ious[0], out_dir=out_dir,
                          write=self.primary)
        ious = result["ious"]
        # NOTE: the best-tracker update is intentionally absent here —
        # the reference has it commented out (main.py:1018), so every
        # eval with iou > self.ious[0] re-renders the comparison video.
        # Per-epoch best tracking lives in segmentation_training behind
        # -directeval (TrainHandler.py:1077-1080).
        print("\nRESULTS", ious)
        self.last_ious = [float(v) for v in ious]
        self.metrics.write("eval", iou=ious[0],
                           all_ious=self.last_ious)
        return ious

    def segment(self, folder: str) -> Dict:
        """-process (main.py:1103-1223). A --source-imgs path that is
        a video FILE routes to the video driver (framework extension);
        directories keep the reference folder semantics.

        Without -crf the mask D2H goes reduced-wire: PNG-space uint8
        soft masks plus (when --binarymaskthreshold) the in-graph
        binarization — 1/4 the dominant transfer with bit-identical
        outputs (pipeline.py wire docs; VERDICT r3 #4). CRF consumes
        f32 probabilities, so -crf keeps the f32 wire untouched."""
        cfg = self.cfg
        wire = "f32" if cfg.crf else "u8"
        hard = (cfg.binarymaskthreshold
                if wire == "u8" and cfg.binarymaskthreshold else None)
        pipe = self._pipeline(salience=cfg.process_salience,
                              wire=wire, hard_threshold=hard)
        if os.path.isfile(folder) and \
                folder.lower().endswith(VIDEO_EXTS):
            from cgs_tpu.eval.segment import segment_video
            return segment_video(self.cfg, pipe, folder,
                                 crf_fn=self._crf_fn(),
                                 write=self.primary)
        return segment_folder(self.cfg, pipe, folder,
                              crf_fn=self._crf_fn(),
                              write=self.primary)

    def visualize(self) -> List[str]:
        """-viscritic/-vismasker curve videos (main.py:702-885).

        --trainasvis N visualizes the first N *train* frames instead
        of the test split, from clean_data when -cleaned
        (main.py:736-742); otherwise the held-out test set."""
        from cgs_tpu.eval.visualize import visualize as vis
        cfg = self.cfg
        if cfg.trainasvis:
            if cfg.cleaned:
                from cgs_tpu.data.collect import clean_data
                x, y, _ = clean_data(cfg)
                y = np.tile(y, (7, 1)) if y.ndim == 1 else y
            else:
                x, y, _ = collect_data(cfg)
            x = x[: cfg.trainasvis]
            y_mat = y[:, : cfg.trainasvis]
            y_row = y_mat[cfg.rewidx]
        else:
            if self.data is None:
                self.load_data()
            x = self.data.x_test
            y_mat = self.data.y_test
            y_row = y_mat[cfg.rewidx]
        pipe = self._pipeline(salience=False)
        return vis(cfg, pipe, x, y_row, self.path, y_matrix=y_mat,
                   write=self.primary)

    def log(self, *args, key: str = "", **kwargs) -> None:
        """Gated print (main.py:887-889)."""
        if key in ("info",):
            print(*args, **kwargs)

    def close(self) -> None:
        """Release held resources (the metrics.jsonl handle). Needed
        by multi-Handler processes (sandbox/multirun's per-seed sweep)
        — a single CLI run can rely on process exit."""
        self.metrics.close()
