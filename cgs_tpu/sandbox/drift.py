"""Critic-drift probe: measure WHY the full model collapses.

The paired ablations (RESULTS.md) established THAT the full model
(live critic, reference default) collapses on the hard fixture while
`-frozen` does not — deterministically at the published width
(20/20 seeds at chfak=5). This probe measures the mechanism directly
instead of inferring it from final IoUs: after every masker epoch it
snapshots, for the SAME production training stream the Handler would
dispatch (identical derived per-(epoch, step) RNG, handler.py
chunk_rngs; identical chunk programs, train/loops.py):

  * `test_mse`     — the live critic's MSE on the held-out test split
                     (does the critic FORGET the reward signal?);
  * `separation`   — mean critic pred on the positive contrastive
                     bank minus the negative bank (does the
                     contrastive signal survive?);
  * `param_drift`  — relative L2 distance of the critic params from
                     the phase-1 critic (how far does it move?);
  * `embeds_drift` — relative L1 change of each of the 5 skip-pyramid
                     levels on a fixed clean probe batch (the masker
                     reads THESE as its skip features, nets.py:497 —
                     if they move, the masker's input distribution
                     moves under it);
  * `iou`          — the masker's in-run IoU vs synthetic GT.

Usage (defaults mirror the RESULTS.md chfak=5 ablation protocol):

    python -m cgs_tpu.sandbox.drift -synthetic_data \
        --synthetic-variant hard --datasize 40000 --cepochs 15 \
        --mepochs 12 --chfak 5 --dropout 0.5 --model drift5 \
        --variants full,frozen

Prints one JSON line per (variant, epoch) plus a summary. Variants
share cfg.seed, so the phase-1 critic is bit-identical across them
(the variant flags only alter the masker phase) — the traces are
paired by construction. Requires -synthetic_data (the IoU tap needs
ground truth).
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

from cgs_tpu.sandbox.ablation import VARIANT_FLAGS, _with_variant


def _pop_str(argv: List[str], flag: str, default: str) -> str:
    for i, tok in enumerate(argv):
        if tok == flag and i + 1 < len(argv):
            val = argv[i + 1]
            del argv[i:i + 2]
            return val
        if tok.startswith(flag + "="):
            del argv[i]
            return tok.split("=", 1)[1]
    return default


def _make_probe(critic, masker, thresh: float):
    """One jitted program computing every per-epoch metric. Banks and
    eval arrays are jit ARGUMENTS (not closure constants) so the
    2450-frame eval set is not baked into the executable."""
    import jax
    import jax.numpy as jnp

    def ingest(u8):
        return u8.astype(jnp.float32) * (1.0 / 255.0)

    def probe(cparams, mparams, c0params, x_test, y_test, xpos, xneg,
              probe_x, embeds1, x_eval, gt_eval, eval_idx):
        pred_t = critic.apply({"params": cparams}, ingest(x_test))
        test_mse = jnp.mean((pred_t[:, 0] - y_test) ** 2)

        p_pos = critic.apply({"params": cparams}, ingest(xpos))
        p_neg = critic.apply({"params": cparams}, ingest(xneg))
        separation = jnp.mean(p_pos) - jnp.mean(p_neg)

        # relative L2 param distance from the phase-1 critic
        sq = sum(jnp.sum((a - b) ** 2) for a, b in zip(
            jax.tree.leaves(cparams), jax.tree.leaves(c0params)))
        nrm = sum(jnp.sum(b ** 2)
                  for b in jax.tree.leaves(c0params))
        param_drift = jnp.sqrt(sq) / jnp.sqrt(nrm)

        # skip-pyramid drift on the fixed clean probe batch
        _, em_now = critic.apply({"params": cparams}, ingest(probe_x),
                                 collect=True)
        embeds_drift = [
            jnp.mean(jnp.abs(e - e1)) / (jnp.mean(jnp.abs(e1)) + 1e-8)
            for e, e1 in zip(em_now, embeds1)]

        # masker IoU vs GT, scanned over eval chunks (cf.
        # seed_parallel._seeded_eval_counts)
        n = x_eval.shape[0]
        valid = (jnp.arange(eval_idx.size).reshape(eval_idx.shape)
                 < n)

        def body(carry, inp):
            bidx, v = inp
            xb = ingest(jnp.take(x_eval, bidx, axis=0))
            _, em = critic.apply({"params": cparams}, xb,
                                 collect=True)
            z = masker.apply({"params": mparams}, xb, em)
            hard = (z[..., 0] > thresh) & v[:, None, None]
            g = jnp.take(gt_eval, bidx, axis=0) & v[:, None, None]
            return (carry[0] + jnp.sum(hard & g, dtype=jnp.int32),
                    carry[1] + jnp.sum(hard | g, dtype=jnp.int32)), 0

        (inter, union), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(0)), (eval_idx, valid))
        iou = inter / jnp.maximum(union, 1)
        return dict(test_mse=test_mse, separation=separation,
                    param_drift=param_drift, iou=iou,
                    embeds_drift=jnp.stack(embeds_drift))

    return jax.jit(probe)


def run_variant(cfg, x_eval, gt_eval, eval_thresh: float = 0.05,
                ) -> List[dict]:
    """Train one variant with the Handler's exact phase-1 + masker
    schedule, probing after phase 1 (epoch 0 row) and after every
    masker epoch. Returns the metric rows."""
    import jax
    import jax.numpy as jnp

    from cgs_tpu.handler import CRITIC, MASKER, Handler
    from cgs_tpu.train.contrastive import sample_index_stacks
    from cgs_tpu.train.loops import make_masker_chunk
    from cgs_tpu.train.steps import (init_train_state, make_optimizer,
                                     trained_param_keys)

    handler = Handler(cfg)
    handler.load_data()
    handler.critic_pipe("train")
    sets = handler.extract_contrastive_data()

    # phase-1 critic snapshot — a REAL copy: the masker chunk donates
    # its train state, and handler.params[CRITIC] aliases those very
    # buffers (device_put of an on-device array is an alias, and the
    # first chunk would delete the snapshot out from under the probe)
    theta1 = jax.tree.map(lambda a: jnp.array(a, copy=True),
                          handler.params[CRITIC])
    x_test = jnp.asarray(handler.data.x_test[:512])
    y_test = jnp.asarray(
        handler.data.y_test[cfg.rewidx][:512].astype(np.float32))
    xpos_b, xneg_b = sets.xpos[:512], sets.xneg[:512]
    probe_x = jnp.concatenate([sets.xpos[:128], sets.xneg[:128]])
    _, embeds1 = handler.critic.apply(
        {"params": theta1}, probe_x.astype(jnp.float32) / 255.0,
        collect=True)
    x_eval_d, gt_d = jnp.asarray(x_eval), jnp.asarray(gt_eval)
    n = x_eval.shape[0]
    eb = 490
    eval_idx = jnp.asarray(np.minimum(
        np.arange(-(-n // eb) * eb, dtype=np.int32), n - 1
    ).reshape(-1, eb))

    probe = _make_probe(handler.critic, handler.masker, eval_thresh)

    def snap(state_params, losses_epoch) -> dict:
        out = probe(state_params[CRITIC], state_params[MASKER],
                    theta1, x_test, y_test, xpos_b, xneg_b, probe_x,
                    embeds1, x_eval_d, gt_d, eval_idx)
        row = {k: (np.asarray(v).round(6).tolist()
                   if k == "embeds_drift" else float(v))
               for k, v in out.items()}
        if losses_epoch is not None:
            m = np.concatenate(losses_epoch, axis=0).mean(axis=0)
            row.update(replace_loss=float(m[0]),
                       live_critic_loss=float(m[3]))
        return row

    # masker loop == handler.segmentation_training's schedule
    # (derived per-(epoch, step) RNG; citations there)
    tx = make_optimizer(cfg.critic_lr_scale)
    state = init_train_state(dict(handler.params), tx,
                             trained_param_keys(cfg))
    chunk_fn = make_masker_chunk(cfg, handler.critic, handler.masker,
                                 tx)
    k = 32
    steps_per_epoch = -(-sets.n_pos // k)
    key_base = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed), 0x6d61736b)

    rows = [dict(epoch=0, **snap(state.params, None))]
    print(json.dumps(dict(variant=cfg.model, **rows[0])), flush=True)
    for epoch in range(cfg.mepochs):
        done, ep_losses = 0, []
        while done < steps_per_epoch:
            s = min(cfg.visevery, steps_per_epoch - done)
            crng = np.random.default_rng(np.random.SeedSequence(
                [cfg.seed, 0x6d61736b, epoch, done]))
            kk = jax.random.fold_in(
                jax.random.fold_in(key_base, epoch), done)
            kchunk, _ = jax.random.split(kk)
            h, l, c = sample_index_stacks(crng, sets.n_pos,
                                          sets.n_neg, s, k)
            state, losses = chunk_fn(
                state, sets.xpos, sets.ypos, sets.xneg, sets.yneg,
                jnp.asarray(h), jnp.asarray(l), jnp.asarray(c),
                kchunk)
            ep_losses.append(np.asarray(losses))
            done += s
        rows.append(dict(epoch=epoch + 1, **snap(state.params,
                                                 ep_losses)))
        print(json.dumps(dict(variant=cfg.model, **rows[-1])),
              flush=True)
    return rows


def main(argv: Optional[List[str]] = None) -> dict:
    import sys

    from cgs_tpu.core.config import parse_args
    from cgs_tpu.data.synthetic import synthetic_eval_set

    argv = list(sys.argv[1:] if argv is None else argv)
    variants = [v for v in _pop_str(argv, "--variants",
                                    "full,frozen").split(",") if v]
    eval_thresh = float(_pop_str(argv, "--eval-thresh", "0.05"))
    unknown = [v for v in variants if v not in VARIANT_FLAGS]
    if unknown:
        raise SystemExit(f"unknown variants {unknown}; choose from "
                         f"{sorted(VARIANT_FLAGS)}")

    cfg0 = parse_args(list(argv))
    if not cfg0.synthetic_data:
        raise SystemExit("drift probe needs -synthetic_data "
                         "(the IoU tap requires ground truth)")
    x_eval, gt = synthetic_eval_set(
        n_frames=5000, seed=99, variant=cfg0.synthetic_variant)
    x_eval, gt = x_eval[100:5000:2], gt[100:5000:2]

    results = {}
    for variant in variants:
        cfg = parse_args(_with_variant(list(argv), variant))
        print(f"[drift] {variant}: {cfg.model}", flush=True)
        results[variant] = run_variant(cfg, x_eval, gt, eval_thresh)

    print("\ndrift summary (epoch 0 -> final):")
    for variant, rows in results.items():
        a, b = rows[0], rows[-1]
        print(f"  {variant:9s} iou {a['iou']:.3f}->{b['iou']:.3f}  "
              f"test_mse {a['test_mse']:.4f}->{b['test_mse']:.4f}  "
              f"separation {a['separation']:.3f}->{b['separation']:.3f}  "
              f"param_drift ->{b['param_drift']:.3f}  "
              f"embeds_drift(top) ->{b['embeds_drift'][0]:.3f}",
              flush=True)
    return results


if __name__ == "__main__":
    main()
