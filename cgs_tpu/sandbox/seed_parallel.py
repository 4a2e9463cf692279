"""Seed-parallel multirun: train ALL seeds of the paper's multi-seed
protocol simultaneously as one compiled program.

The reference runs its `--runs` seeds serially (TrainHandler.py
`main()`, 4024-4056: a host loop re-building models and re-training
per seed). The TPU-native redesign vmaps the whole two-phase training
over a leading seed axis:

  * ONE parameter pytree with a leading (R,) seed dim (vmapped init),
  * ONE lax.scan chunk program per phase, `jax.vmap`ped over
    (state, per-seed index stacks, per-seed RNG keys) with the
    device-resident frame banks SHARED across seeds (in_axes=None —
    the dataset is identical for every seed; only init and sampling
    differ),
  * on a multi-chip mesh the seed axis shards over 'data'
    (seed-per-device): each chip trains its own replicas with ZERO
    gradient communication — embarrassing parallelism, the ICI is
    idle instead of all-reducing like ordinary DP.

Per-seed math is IDENTICAL to the serial trainers (the vmapped
function IS train/loops.py's chunk body) — pinned by equivalence
tests in tests/test_seed_parallel.py.

Protocol deviations vs looping sandbox/multirun.py (documented, not
silent):
  * the masker phase runs a COMMON step count = ceil(max_r |pos_r|/K)
    (the reference derives steps from each seed's own positive count,
    main.py:342; steps sample with replacement, so extra steps for
    smaller-|pos| seeds are extra draws from the same distribution);
  * RNG streams differ from Handler's chain (per-seed
    np.random.default_rng(base_seed+r) for sampling, fold_in'd jax
    keys for shift/dropout);
  * per-chunk viz strips / loss PNGs are not rendered (artifact
    parity lives in the serial Handler path); eval is the on-device
    IoU, without the CRF/saliency variants.

Single-chip capacity: the masker chunk's live state scales with
R x chunk_steps (the scan keeps R seed states + per-step gathered
batches); measured on a 16 GB v5e-1 at the 40k-frame protocol,
R=30 @ chunk_steps=100 needs 17.8 GB and fails to compile while
R=20 fits. Lower `--chunk-steps` (CLI) / chunk_steps= (API) to trade
dispatch count for memory, or shard the seed axis over a mesh.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cgs_tpu.train.loops import critic_chunk_fn, masker_chunk_fn
from cgs_tpu.train.losses import ingest
from cgs_tpu.train.steps import (
    init_train_state, make_optimizer, trained_param_keys,
)

K = 32  # contrastive batch (main.py:309)


# ---------------------------------------------------------------------
# vmapped init / chunks / sweep / eval
# ---------------------------------------------------------------------

def init_seed_params(critic, masker, keys, separate: bool = False):
    """Vmapped init: keys (R,) PRNG keys -> params pytree with a
    leading (R,) seed axis on every leaf ({critic, masker[, sepcrit]},
    the registry of main.py:106-111)."""
    x0 = jnp.zeros((1, 64, 64, 3))

    def one(key):
        kc, km, ks = jax.random.split(key, 3)
        cp = critic.init({"params": kc}, x0, collect=True)["params"]
        _, em = critic.apply({"params": cp}, x0, collect=True)
        mp = masker.init({"params": km}, x0, em)["params"]
        params = {"critic": cp, "masker": mp}
        if separate:
            params["sepcrit"] = critic.init(
                {"params": ks}, x0, collect=True)["params"]
        return params

    return jax.vmap(one)(keys)


def init_seed_state(params, tx, trained_keys=None):
    """Stacked TrainState: every leaf (params, Adam moments, counts,
    step) carries the leading seed axis."""
    return jax.vmap(
        lambda p: init_train_state(p, tx, trained_keys))(params)


def _seed_jit(vchunk, mesh, n_bank_args: int, n_seed_args: int):
    """jit a vmapped chunk. With a mesh: the SEED axis (leading dim of
    state / index stacks / keys) shards over 'data' via `shard_map`;
    the frame banks replicate. No collective exists in the program —
    seeds are independent, each device runs the plain vmapped chunk on
    its local seed slice.

    shard_map (not jit in_shardings) is deliberate: letting the GSPMD
    partitioner shard the vmapped program miscompiles the critic's
    4x4-VALID bottleneck conv (nets.py:186's batch-grouped form) on
    XLA:CPU — jax 0.9.0, max-abs error ~71 on O(10) values in the
    minimal repro (batch-sharded `vmap(conv_general_dilated)`, VALID
    window == input size). shard_map sidesteps the partitioner for
    the whole body; tests/test_seed_parallel.py pins mesh == serial."""
    if mesh is None:
        return jax.jit(vchunk, donate_argnums=(0,))
    try:
        from jax import shard_map
    except ImportError:                       # older jax
        from jax.experimental.shard_map import shard_map
    seed = P("data")
    repl = P()
    in_specs = ((seed,) + (repl,) * n_bank_args
                + (seed,) * n_seed_args)
    sm = shard_map(vchunk, mesh=mesh, in_specs=in_specs,
                   out_specs=(seed, seed))
    return jax.jit(sm, donate_argnums=(0,))


def make_seeded_critic_chunk(cfg, critic, tx, mesh=None):
    """Jitted: (sstate, x_all u8 (N,...), y_all (N,),
    valid (S,) bool, idx (R,S,B) i32, keys (R,)) ->
    (sstate, losses (R,S)). R seeds x S optimizer steps in one
    dispatch; `valid` masks padded tail steps to identities (shared
    across seeds, so every chunk of a phase reuses ONE compiled
    shape — ADVICE r3)."""
    chunk = critic_chunk_fn(cfg, critic, tx, masked=True)
    vchunk = jax.vmap(chunk, in_axes=(0, None, None, None, 0, 0))
    return _seed_jit(vchunk, mesh, n_bank_args=3, n_seed_args=2)


def make_seeded_masker_chunk(cfg, critic, masker, tx, mesh=None,
                             fuse: str = "both"):
    """Jitted: (sstate, x_all u8, y_row (N,), valid (S,) bool,
    h (R,S,K), l (R,S,K), c (R,S,2K), keys (R,)) ->
    (sstate, losses (R,S,4)).

    The bank is passed as BOTH pos and neg side of the masker chunk
    with per-seed ABSOLUTE indices (each seed's pos/neg split differs
    because its critic differs — absolute indexing shares one bank
    instead of materializing R gathered copies). `valid` as in
    make_seeded_critic_chunk."""
    chunk = masker_chunk_fn(cfg, critic, masker, tx, fuse=fuse,
                            masked=True)

    def abs_chunk(state, x_all, y_row, valid, h, l, c, key):
        return chunk(state, x_all, y_row, x_all, y_row, valid,
                     h, l, c, key)

    vchunk = jax.vmap(abs_chunk,
                      in_axes=(0, None, None, None, 0, 0, 0, 0))
    return _seed_jit(vchunk, mesh, n_bank_args=3, n_seed_args=4)


@functools.partial(jax.jit, static_argnums=0)
def _seeded_sweep(critic, cparams, x_all, idx):
    """Vmapped deterministic full-set sweep (main.py:245-253):
    cparams with leading (R,) axis, idx (C, batch) shared ->
    preds (R, C*batch)."""

    def one(cp):
        def body(_, bidx):
            xb = ingest(jnp.take(x_all, bidx, axis=0))
            return 0, critic.apply({"params": cp}, xb,
                                   deterministic=True).squeeze(-1)

        _, preds = jax.lax.scan(body, 0, idx)
        return preds.reshape(-1)

    return jax.vmap(one)(cparams)


def _unshard(tree):
    """GSPMD-bug defense for the plain-jit sweep/eval programs (see
    _seed_jit): a leaf left P('data')-sharded by a meshed training
    chunk would route the vmapped forward through the partitioner,
    which miscompiles the 4x4-VALID bottleneck conv. Materialize
    multi-device leaves to host numpy — the jit then runs
    unpartitioned (exact); the trees are ~30 KB, one call per run."""
    def fix(a):
        if isinstance(a, jax.Array) and len(a.sharding.device_set) > 1:
            return np.asarray(a)
        return a

    return jax.tree.map(fix, tree)


def _sweep_batch(critic, runs: int, cap: int = 4096) -> int:
    """HBM-aware sweep batch: the vmapped sweep folds the seed axis
    into conv channels, so the first-conv activation costs
    batch*R*8*chfak floats per pixel. Hold batch*R*chfak at the
    proven chfak=1/R=10 point (4096*10 -> ~5.4 GB f32); the old
    fixed 4096 at chfak=5/R=10 was a 26.8 GB allocation that OOMs
    the 16 GB v5e."""
    ch = int(getattr(critic, "chfak", 1) or 1)
    b = (cap * 10) // max(runs * ch, 1)
    return max(256, min(cap, (b // 256) * 256))


def seeded_sweep(critic, cparams, x_dev, n: int,
                 batch: Optional[int] = None) -> np.ndarray:
    """(R, n) host preds over n device-resident frames."""
    if batch is None:
        runs = jax.tree.leaves(cparams)[0].shape[0]
        batch = _sweep_batch(critic, int(runs))
    n_chunks = -(-n // batch)
    idx = np.minimum(np.arange(n_chunks * batch, dtype=np.int32),
                     n - 1).reshape(n_chunks, batch)
    return np.asarray(_seeded_sweep(critic, _unshard(cparams), x_dev,
                                    idx))[:, :n]


def _eval_embeds(critic, p, xb):
    """Feature source for the masker: the sepcrit's embeds in a
    -separate run (pipeline.py:140-144 / main.py:946-947 — the masker
    was TRAINED on those features), the critic's otherwise."""
    src = p["sepcrit"] if "sepcrit" in p else p["critic"]
    _, em = critic.apply({"params": src}, xb, collect=True,
                         deterministic=True)
    return em


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def _seeded_eval_counts(critic, masker, params, x_eval, gt, idx,
                        thresh: float):
    """Per-seed IoU counts over the eval set, accumulated on device:
    idx (C, batch) with clipped padding, valid rows weighted by the
    `first occurrence` mask -> (R,) inter, (R,) union int32."""
    n = x_eval.shape[0]
    # idx is the clipped arange stack, so padded (duplicate) rows are
    # exactly the flat positions >= n — weight them out
    valid = (jnp.arange(idx.size).reshape(idx.shape) < n)

    def one(p):
        def body(carry, inp):
            bidx, v = inp
            xb = ingest(jnp.take(x_eval, bidx, axis=0))
            em = _eval_embeds(critic, p, xb)
            z = masker.apply({"params": p["masker"]}, xb, em)
            hard = (z[..., 0] > thresh) & v[:, None, None]
            g = jnp.take(gt, bidx, axis=0) & v[:, None, None]
            inter = jnp.sum(hard & g, dtype=jnp.int32)
            union = jnp.sum(hard | g, dtype=jnp.int32)
            return (carry[0] + inter, carry[1] + union), 0

        (i, u), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0)), (idx, valid))
        return i, u

    return jax.vmap(one)(params)


def eval_seeds(critic, masker, params, x_eval, gt,
               thresh: float = 0.05, batch: int = 256) -> np.ndarray:
    """Per-seed mask IoU vs GT at --eval-thresh (main.py:964,
    1265-1270). x_eval u8 (N,64,64,3) device-resident, gt bool
    (N,64,64). Returns (R,) float IoUs."""
    n = int(x_eval.shape[0])
    n_chunks = -(-n // batch)
    idx = np.minimum(np.arange(n_chunks * batch, dtype=np.int32),
                     n - 1).reshape(n_chunks, batch)
    inter, union = _seeded_eval_counts(critic, masker,
                                       _unshard(params), x_eval,
                                       jnp.asarray(gt), idx,
                                       float(thresh))
    return np.asarray(inter) / np.maximum(np.asarray(union), 1)


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def _ensemble_eval_counts(critic, masker, params, x_eval, gt, idx,
                          thresh: float):
    """Seed-ensemble IoU counts: mean soft mask over the seed axis,
    thresholded, vs GT — a capability the serial reference protocol
    has no analogue for (each of its runs is an independent model;
    here all R masks of a frame come out of one vmapped forward)."""
    n = x_eval.shape[0]
    valid = (jnp.arange(idx.size).reshape(idx.shape) < n)

    def body(carry, inp):
        bidx, v = inp
        xb = ingest(jnp.take(x_eval, bidx, axis=0))

        def one(p):
            em = _eval_embeds(critic, p, xb)
            return masker.apply({"params": p["masker"]}, xb,
                                em)[..., 0]

        z = jax.vmap(one)(params)
        hard = (jnp.mean(z, axis=0) > thresh) & v[:, None, None]
        g = jnp.take(gt, bidx, axis=0) & v[:, None, None]
        return (carry[0] + jnp.sum(hard & g, dtype=jnp.int32),
                carry[1] + jnp.sum(hard | g, dtype=jnp.int32)), 0

    (i, u), _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(0)),
                             (idx, valid))
    return i, u


def ensemble_iou(critic, masker, params, x_eval, gt,
                 thresh: float = 0.05, batch: int = 256) -> float:
    """IoU of the R-seed mean-mask ensemble at --eval-thresh."""
    n = int(x_eval.shape[0])
    n_chunks = -(-n // batch)
    idx = np.minimum(np.arange(n_chunks * batch, dtype=np.int32),
                     n - 1).reshape(n_chunks, batch)
    inter, union = _ensemble_eval_counts(
        critic, masker, _unshard(params), x_eval, jnp.asarray(gt),
        idx, float(thresh))
    return float(inter) / max(float(union), 1)


# ---------------------------------------------------------------------
# the driver
# ---------------------------------------------------------------------

def _build_models(cfg):
    """Models per the Config — the same construction as
    handler.py:79-86 / serve.py (neck/chfak widths, --bf16 compute
    dtype); the saved-checkpoint fingerprints encode chfak, so the
    trained architecture MUST match the flags."""
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder

    cdt = jnp.bfloat16 if cfg.bf16 else jnp.float32
    critic = Critic(bottleneck=cfg.neck, chfak=cfg.chfak,
                    dropout=cfg.dropout, compute_dtype=cdt)
    masker = UnetDecoder(bottleneck=cfg.neck, chfak=cfg.chfak,
                         compute_dtype=cdt)
    return critic, masker


def run_parallel(cfg, x, y, runs: int, base_seed: int = 0,
                 mesh=None, x_eval=None, gt_eval=None,
                 results_path: Optional[str] = "results.txt",
                 chunk_steps: int = 100, verbose: bool = True,
                 save_checkpoints: bool = False) -> dict:
    """Two-phase training of `runs` seeds in parallel on one bank.

    cfg: a derived Config. x (N,64,64,3) u8 / y (7,N) labels as from
    collect_data. Critic phase: cfg.cepochs epochs of per-seed
    shuffled batches (main.py:182-199). Contrastive split + masker
    phase per main.py:238-463. Eval: on-device per-seed IoU plus the
    R-seed mean-mask ensemble IoU when (x_eval, gt_eval) given.
    save_checkpoints: write per-seed reference-layout .pt files under
    `{model}-seed{s}/saves/` (the serial multirun's run-name
    convention) — the PHASE-1 critic and the final masker, mirroring
    the reference's persistence quirk (live-critic updates are never
    saved, main.py:565,575,1561-1564). Returns {'ious','mean','std',
    'best','ensemble_iou','params','elapsed_s','steps': {...}}.

    A -separate run's sepcrit is trained and used for eval features
    but NOT persisted — the reference never saves it either (its
    load_models list is [critic, masker], main.py:1554-1564), so a
    reloaded -separate run falls back to a random sepcrit upstream
    and here alike (the quirk is the contract).

    Single-controller only: host-side sampling and np.asarray
    readbacks assume every shard is addressable. For multi-process
    meshes drive make_seeded_*_chunk directly (the pattern
    tests/test_multihost.py proves)."""
    from cgs_tpu.data.loader import DataBundle

    if jax.process_count() > 1:
        raise NotImplementedError(
            "run_parallel is a single-controller driver; on "
            "multi-process meshes call make_seeded_critic_chunk / "
            "make_seeded_masker_chunk directly with host-numpy state "
            "(see tests/test_multihost.py::"
            "test_two_process_seed_parallel_matches_local)")
    if mesh is not None and runs % mesh.shape["data"]:
        raise ValueError(
            f"runs={runs} must divide over the 'data' axis "
            f"({mesh.shape['data']}) for seed-per-device sharding")

    t0 = time.time()
    bundle = DataBundle.from_arrays(
        x, y, np.arange(x.shape[0], dtype=np.int64), cfg)
    repl = None
    if mesh is not None:
        from cgs_tpu.parallel.mesh import replicated_sharding
        repl = replicated_sharding(mesh)
    bundle.to_device(cfg, sharding=repl)
    # y_train_dev IS the (N,) rewidx label row (data/loader.py:34) —
    # the same array serves both phases
    x_dev, y_dev = bundle.x_train_dev, bundle.y_train_dev
    n_train = bundle.n_train

    critic, masker = _build_models(cfg)
    keys = jax.vmap(jax.random.PRNGKey)(
        np.arange(base_seed, base_seed + runs, dtype=np.uint32))
    params = init_seed_params(critic, masker, keys,
                              separate=cfg.separate)
    if repl is not None:
        from cgs_tpu.parallel.mesh import seed_sharding
        keys = jax.device_put(np.asarray(keys), seed_sharding(mesh))

    def seed_keys(tag: int) -> jax.Array:
        return jax.vmap(lambda k: jax.random.fold_in(k, tag))(keys)

    rngs = [np.random.default_rng(base_seed + r) for r in range(runs)]

    # ---- phase 1: critic (main.py:158-236) --------------------------
    tx = make_optimizer()
    cstate = init_seed_state(
        {"critic": params["critic"]}, tx)
    cchunk = make_seeded_critic_chunk(cfg, critic, tx, mesh=mesh)
    B = int(cfg.batch_size)
    steps_epoch = -(-n_train // B)
    cchunk_steps = min(chunk_steps, steps_epoch)  # single-chunk
    # phases smaller than chunk_steps need no padding source
    tag = 0
    closses = []
    for epoch in range(cfg.cepochs):
        # per-seed shuffled epoch with wrap (EpochLoader semantics)
        stacks = []
        for rng in rngs:
            perm = rng.permutation(n_train).astype(np.int32)
            pad = steps_epoch * B - n_train
            if pad:
                perm = np.concatenate([perm, perm[:pad]])
            stacks.append(perm.reshape(steps_epoch, B))
        idx_all = np.stack(stacks)                  # (R, S_epoch, B)
        for s0 in range(0, steps_epoch, cchunk_steps):
            sl = idx_all[:, s0:s0 + cchunk_steps]
            s = sl.shape[1]
            if s < cchunk_steps:    # pad the tail to the ONE chunk
                # shape; padded steps are masked to identities
                sl = np.concatenate(
                    [sl, idx_all[:, :cchunk_steps - s]], axis=1)
            valid = np.arange(cchunk_steps) < s
            tag += 1
            cstate, losses = cchunk(cstate, x_dev, y_dev, valid, sl,
                                    seed_keys(tag))
            losses = np.asarray(losses)[:, :s]
            closses.append(losses)
        if verbose:
            print(f"[seed-parallel] critic epoch {epoch + 1}/"
                  f"{cfg.cepochs} loss/seed "
                  f"{losses[:, -1].round(4)}", flush=True)
    params = {**params, "critic": cstate.params["critic"]}
    critic_steps = cfg.cepochs * steps_epoch
    # the PERSISTED critic is the phase-1 result: the reference never
    # saves the masker phase's live-critic updates (main.py:565,575,
    # 1561-1564) — snapshot before phase 2 overwrites params
    critic_p1_host = jax.tree.map(np.asarray, params["critic"]) \
        if save_checkpoints else None

    # ---- contrastive split (main.py:238-312), per seed --------------
    # (seeded_sweep/_unshard pulls meshed seed-sharded params to host
    # itself — the GSPMD-bug defense lives in the wrappers)
    preds = seeded_sweep(critic, params["critic"], x_dev, n_train)
    pos_lists, neg_lists = [], []
    for r in range(runs):
        pos = np.nonzero(preds[r] > cfg.high_rew_thresh)[0]
        neg = np.nonzero(preds[r] < cfg.low_rew_thresh)[0]
        assert len(pos) >= cfg.contrastive_min \
            and len(neg) >= cfg.contrastive_min, (
            f"seed {base_seed + r}: contrastive split too small "
            f"({len(pos)} pos / {len(neg)} neg, need "
            f">={cfg.contrastive_min} each, main.py:281)")
        assert preds[r][pos].mean() > cfg.high_rew_thresh  # main.py:302
        pos_lists.append(pos.astype(np.int32))
        neg_lists.append(neg.astype(np.int32))

    # ---- phase 2: masker (main.py:314-575) ---------------------------
    tx2 = make_optimizer(cfg.critic_lr_scale)
    trained = trained_param_keys(cfg)
    mstate = init_seed_state(dict(params), tx2, trained)
    mchunk = make_seeded_masker_chunk(cfg, critic, masker, tx2,
                                      mesh=mesh)
    # common step count: ceil(max |pos|/K) (deviation, see module doc)
    steps_masker = -(-max(len(p) for p in pos_lists) // K)
    mchunk_steps = min(chunk_steps, steps_masker)
    mlosses = []
    for epoch in range(cfg.mepochs):
        for s0 in range(0, steps_masker, mchunk_steps):
            s = min(mchunk_steps, steps_masker - s0)
            # draws always fill the full chunk shape; the tail's
            # surplus steps are masked to identities (one compiled
            # shape per phase — ADVICE r3)
            h = np.stack([rngs[r].choice(pos_lists[r],
                                         (mchunk_steps, K))
                          for r in range(runs)])
            l = np.stack([rngs[r].choice(neg_lists[r],
                                         (mchunk_steps, K))
                          for r in range(runs)])
            c = np.stack([rngs[r].choice(neg_lists[r],
                                         (mchunk_steps, 2 * K))
                          for r in range(runs)])
            valid = np.arange(mchunk_steps) < s
            tag += 1
            mstate, losses = mchunk(mstate, x_dev, y_dev, valid,
                                    h.astype(np.int32),
                                    l.astype(np.int32),
                                    c.astype(np.int32),
                                    seed_keys(tag))
            losses = np.asarray(losses)[:, :s]
            mlosses.append(losses)
        if verbose:
            ll = losses[:, -1]                    # (R, 4)
            print(f"[seed-parallel] masker epoch {epoch + 1}/"
                  f"{cfg.mepochs} replace/seed {ll[:, 0].round(4)}",
                  flush=True)
    # take EVERY sub-tree from the output state, not just the trained
    # ones: the first mchunk call DONATED the input state, so the
    # pre-phase `params` entries it aliased (the critic under -frozen,
    # where it is constant) now reference deleted device buffers. The
    # chunk threads constants through unchanged — the output state is
    # the only live copy of every sub-tree.
    params = {**params, **dict(mstate.params)}

    if save_checkpoints:
        import dataclasses

        from cgs_tpu.train.checkpoints import (
            checkpoint_paths, save_model_pt,
        )
        masker_host = jax.tree.map(np.asarray, params["masker"])
        for r in range(runs):
            cfg_r = dataclasses.replace(
                cfg, model=f"{cfg.model}-seed{base_seed + r}").derive()
            paths = checkpoint_paths(cfg_r)
            take = lambda tree: jax.tree.map(lambda a: a[r], tree)
            save_model_pt(take(critic_p1_host), "critic",
                          paths["critic"])
            save_model_pt(take(masker_host), "masker", paths["masker"])

    # ---- eval (main.py:891-1101, mask variant only) ------------------
    ious = None
    ens = None
    if x_eval is not None and gt_eval is not None:
        xe = jax.device_put(x_eval, repl) if repl is not None \
            else jnp.asarray(x_eval)
        ious = eval_seeds(critic, masker, params, xe, gt_eval,
                          thresh=cfg.eval_thresh)
        ens = ensemble_iou(critic, masker, params, xe, gt_eval,
                           thresh=cfg.eval_thresh)

    elapsed = time.time() - t0
    out = {
        "params": params,
        "elapsed_s": elapsed,
        "steps": {"critic": critic_steps,
                  "masker": cfg.mepochs * steps_masker},
        "critic_losses": np.concatenate(closses, axis=1),
        "masker_losses": np.concatenate(mlosses, axis=1),
    }
    if ious is not None:
        arr = np.asarray(ious, np.float64)
        out.update(ious=arr.tolist(), mean=float(arr.mean()),
                   std=float(arr.std()), best=float(arr.max()),
                   ensemble_iou=ens)
        if results_path:
            line = (f"runs={runs} seed-parallel base_seed={base_seed} "
                    f"ious={[round(v, 3) for v in arr.tolist()]} "
                    f"mean={out['mean']:.3f} std={out['std']:.3f} "
                    f"best={out['best']:.3f} ensemble={ens:.3f}\n")
            with open(results_path, "a") as fp:
                fp.write(line)
    return out


def main(argv: Optional[List[str]] = None) -> dict:
    """`python -m cgs_tpu.sandbox.seed_parallel --runs N <cli args>`:
    the vmapped counterpart of sandbox/multirun.py. Synthetic or
    cached data per the standard flags; eval against the synthetic
    eval fixture."""
    import sys

    from cgs_tpu.core.config import parse_args
    from cgs_tpu.data.collect import collect_data
    from cgs_tpu.data.synthetic import synthetic_eval_set
    from cgs_tpu.parallel.mesh import local_mesh_or_none

    argv = list(argv if argv is not None else sys.argv[1:])
    from cgs_tpu.sandbox.multirun import pop_int, pop_runs
    runs = pop_runs(argv)
    # --chunk-steps: single-chip HBM headroom knob (module docstring
    # "Single-chip capacity"); smaller chunks = less live scan state
    # per dispatch at more dispatches
    chunk_steps = pop_int(argv, "--chunk-steps", 100)
    if chunk_steps < 1:
        raise SystemExit(
            f"--chunk-steps must be >= 1 (got {chunk_steps}): 0 would "
            "crash inside run_parallel's range() and a negative value "
            "would silently skip all training")
    # --base-seed: train seeds [base, base+runs) — the second decade
    # of a 20-seed paired table is `--base-seed 10` (run_parallel
    # stamps {model}-seed{base+r}, matching load_seed_ensemble's
    # base_seed)
    base_seed = pop_int(argv, "--base-seed", 0)
    cfg = parse_args(argv)
    x, y, _ = collect_data(cfg)
    x_eval, gt = synthetic_eval_set(
        n_frames=5000, seed=99,
        variant=getattr(cfg, "synthetic_variant", "easy"))
    x_eval, gt = x_eval[100:5000:2], gt[100:5000:2]  # main.py:927-928
    out = run_parallel(cfg, x, y, runs, base_seed=base_seed,
                       mesh=local_mesh_or_none(cfg),
                       x_eval=x_eval, gt_eval=gt,
                       chunk_steps=chunk_steps,
                       save_checkpoints=True)
    if "ious" in out:
        print(f"[seed-parallel] ious={np.round(out['ious'], 3)} "
              f"mean={out['mean']:.3f} best={out['best']:.3f} "
              f"ensemble={out['ensemble_iou']:.3f} "
              f"({out['elapsed_s']:.1f}s)")
    return out


if __name__ == "__main__":
    main()
