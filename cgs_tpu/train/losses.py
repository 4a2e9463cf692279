"""Loss builders shared by the per-step and scanned-epoch trainers.

See cgs_tpu/train/steps.py for the gradient-topology documentation;
this module holds the pure loss functions themselves.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cgs_tpu.ops.merge import inject_merge, merge_both, replace_merge

Array = jnp.ndarray


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def _clamped_log(x: Array) -> Array:
    """log(x) clamped at -100 like torch F.binary_cross_entropy, with
    a zero (not NaN) gradient at x == 0 (the clamp is active there)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.maximum(jnp.log(safe), -100.0), -100.0)


def bce(pred: Array, target: Array) -> Array:
    """F.binary_cross_entropy on sigmoid outputs (main.py:193,381).
    torch clamps the log terms at -100 (no epsilon inside the log —
    an eps would floor them at ~-27.6 and drift loss/grads from torch
    when the sigmoid saturates in -threshrew runs)."""
    logp = _clamped_log(pred)
    lognp = _clamped_log(1.0 - pred)
    return -jnp.mean(target * logp + (1.0 - target) * lognp)


def ingest(x_u8: Array) -> Array:
    """uint8 NHWC -> float32 [0,1] (main.py:189 `.float()/255`)."""
    return x_u8.astype(jnp.float32) * (1.0 / 255.0)


def build_critic_loss(cfg, critic):
    """(cparams, x f32, y, dropout_key) -> scalar loss
    (main.py:189-195)."""
    use_bce = bool(cfg.threshrew)

    def loss_fn(cparams, x, y, dkey):
        pred = critic.apply({"params": cparams}, x, deterministic=False,
                            rngs={"dropout": dkey})
        pred = pred.squeeze(-1)
        return bce(pred, y) if use_bce else mse(pred, y)

    return loss_fn


def build_masker_loss(cfg, critic, masker, pallas_merge: bool = False,
                      fuse: str = "both"):
    """(trainable, constant, a f32, y, b f32, dropout_key) ->
    (loss, aux) where aux carries the per-term metrics and the
    tensors the reference visualizes (main.py:364-429,466-530).

    pallas_merge: compute both counterfactual merges (and their VJP)
    with the fused Pallas kernel pair (ops/merge.py:merge_both).
    Opt-in only — measured 0.96x the default jnp path on v5e (see
    ops/pallas_kernels.py) — and silently falls back to the jnp
    merges when cfg.inject is off (the fused kernel computes both).

    fuse: batch data-independent critic passes into one call each —
    the MXU-utilization lever for the tiny-batch masker step
    (VERDICT r2 next-round item 2). The reference makes 4 sequential
    critic calls at batch 2K (main.py:364,374,399,408); the pairs
    (A, B) and (replaced, injected) are data-independent, so each can
    run as ONE batch-4K call with the outputs sliced.
      * "none": the reference's 4-call structure — 807.9 steps/s on
        the v5e at reference shapes (S=200 scan chunks, pipelined
        dispatches; RESULTS.md).
      * "merges": fuse (replaced, injected) only. Both slices carry
        live gradients, so the fusion is FLOP-neutral — 993.1
        steps/s (1.23x).
      * "both" (default): additionally fuse (A, B) — 1023.5 steps/s
        (1.27x). negpred is stop-gradient'd (main.py:367), so this
        back-props zero cotangents through B's merged rows (+33% bwd
        conv FLOPs vs "merges"), yet still wins: at 8-16 channels the
        per-kernel overhead of 2 extra dispatches outweighs the
        wasted MXU work.
    Gradient topology is IDENTICAL for all modes: slicing a
    concatenated batch routes each loss term's cotangent only to its
    own rows (no cross-batch ops in the critic — no batchnorm), and
    the stop_gradient placement of main.py:367,400,411 is applied to
    the same tensors. Documented RNG deviation: a fused pair shares
    one dropout-key draw over the merged batch (iid per element, so
    distributionally unchanged; exact draws differ from the 4-call
    stream). Parity tests pin numerics at dropout=0 where all modes
    agree exactly."""
    live = bool(cfg.live)
    inject = bool(cfg.inject)
    separate = bool(cfg.separate)
    staticnorm = bool(cfg.staticnorm)
    use_bce = bool(cfg.threshrew)
    l1 = float(cfg.L1)
    l2 = float(cfg.L2)
    lfak = float(cfg.lfak)
    if fuse not in ("none", "merges", "both"):
        raise ValueError(f"fuse={fuse!r} not in ('none','merges','both')")
    fuse_ab = fuse == "both"
    fuse_merge = fuse in ("merges", "both")

    def apply_critic(cparams, x, dkey, collect=False):
        return critic.apply({"params": cparams}, x, collect=collect,
                            deterministic=False, rngs={"dropout": dkey})

    def loss_fn(trainable: Dict, constant: Dict, a, y, b, dkey):
        p = {**constant, **trainable}
        k = jax.random.split(dkey, 5)
        n = a.shape[0]
        if fuse_ab:
            out, embeds = apply_critic(
                p["critic"], jnp.concatenate([a, b], axis=0), k[0],
                collect=True)
            out = out.squeeze(-1)
            pred = out[:n]
            negpred = jax.lax.stop_gradient(out[n:])
            embeds = [e[:n] for e in embeds]
        else:
            pred, embeds = apply_critic(p["critic"], a, k[0],
                                        collect=True)
            pred = pred.squeeze(-1)
            negpred = jax.lax.stop_gradient(
                apply_critic(p["critic"], b, k[1]).squeeze(-1))

        aux = {"pred": pred, "negpred": negpred}
        loss = 0.0
        if live:  # main.py:378-385
            closs = bce(pred, y) if use_bce else mse(pred, y)
            loss = loss + lfak * closs
            aux["critic"] = closs
        else:
            aux["critic"] = jnp.asarray(0.0)

        if separate:  # main.py:389-390
            _, embeds = apply_critic(p["sepcrit"], a, k[2],
                                     collect=True)

        z = masker.apply({"params": p["masker"]}, a, embeds)
        aux["z"] = z

        if pallas_merge and inject:
            replaced, injected = merge_both(a, b, z)  # main.py:395,406
        else:
            replaced = replace_merge(a, b, z)  # main.py:395
            injected = inject_merge(a, b, z) if inject else None
        if fuse_merge and inject:
            vals = apply_critic(
                p["critic"], jnp.concatenate([replaced, injected],
                                             axis=0), k[3]).squeeze(-1)
            replacevalue = vals[:n]
            injectvalue = vals[n:]
        else:
            replacevalue = apply_critic(p["critic"], replaced,
                                        k[3]).squeeze(-1)
            injectvalue = None
        replaceloss = mse(replacevalue, negpred)  # main.py:400
        loss = loss + replaceloss
        aux["replace"] = replaceloss
        aux["replacevalue"] = replacevalue

        if inject:  # main.py:405-413
            if injectvalue is None:
                injectvalue = apply_critic(p["critic"], injected,
                                           k[4]).squeeze(-1)
            injectloss = mse(injectvalue, jax.lax.stop_gradient(pred))
            loss = loss + injectloss
            aux["inject"] = injectloss
            aux["injectvalue"] = injectvalue
        else:
            aux["inject"] = jnp.asarray(0.0)
            aux["injectvalue"] = jnp.zeros_like(negpred)

        # sparsity (main.py:415-429)
        vf = 1.0 if staticnorm else (
            1.0 - jax.lax.stop_gradient(pred)[:, None, None, None])
        norm = jnp.asarray(0.0)
        logged_norm = jnp.asarray(0.0)
        if l1:
            logged_norm = l1 * jnp.mean(jnp.abs(vf * z))
            norm = norm + logged_norm
        if l2:
            # when BOTH penalties are on, the reference's log shows
            # only the L2 term (`normloss` is overwritten,
            # main.py:421-429); the total loss still contains both
            logged_norm = l2 * jnp.mean((vf * z) ** 2)
            norm = norm + logged_norm
        loss = loss + norm
        aux["norm"] = logged_norm
        aux["loss"] = loss
        return loss, aux

    return loss_fn
