"""Legacy merge-training variants (reference
`contrastive_merge_segmentation_old`, TrainHandler.py:1098-1421, and
the old single-net `segment`, TrainHandler.py:1697-1894).

These predate main.py's `segmentation_training` and differ in ways the
modern loop does not subsume:

  * **percentile split** — high/low contrast sets are the >=80th /
    <=20th percentile of critic scores over the dataset, not fixed
    0.7/0.3 thresholds (TrainHandler.py:1153-1157).
  * **single-net mode** (`-ucritic`) — the full U-Net's own critic
    head scores the merges; `-copy` scores them with a frozen
    parameter snapshot instead (TrainHandler.py:1107-1113,1226).
  * **dist-norm loss** — pulls the mask toward its own centroid:
    target = clamp(mask - dist_to_centroid, 0), 5x MSE
    (TrainHandler.py:1270-1287). The reference computes
    `dist = sqrt(xs^2 + xs^2)` — the y-distance term is a typo'd
    duplicate of x (TrainHandler.py:1283) — reproduced verbatim
    (pass fixed=True for the evident intent).
  * **old `segment` merge loss** — within-batch negatives sampled
    from `pred < 1 - threshold`, ONE replace merge scored with
    BCE-with-logits toward zero (TrainHandler.py:1750-1770), with an
    optional cluster-channel critic input (`-clustercritic`,
    TrainHandler.py:1711-1713,1763-1767) and the reference's
    double-sigmoid live-critic quirk (sigmoid(pred) fed to
    binary_cross_entropy_with_logits, TrainHandler.py:1742-1743) —
    reproduced exactly.

TPU design: each step is ONE jitted function built for `lax.scan`
chunking like train/loops.py. The single-net step samples its
within-batch negatives in-graph with `jax.random.categorical` over
the negative mask instead of the reference's host-side
np.random.choice (fixed shapes, no host sync); the pair step consumes
a pre-sampled (a, b) contrast pair like the reference's loop.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# percentile split (TrainHandler.py:1153-1165)
# ---------------------------------------------------------------------------

def percentile_split(preds: Array, hi: float = 0.8, lo: float = 0.2
                     ) -> Dict[str, Array]:
    """Sort-based split: high = preds >= value at the hi-percentile
    rank, low = preds <= value at the lo rank (the reference indexes
    `sorted[8*len//10]` / `sorted[2*len//10]`; the integer rank math
    here reduces to exactly that for hi=0.8 / lo=0.2 and generalizes
    to any hundredth without silent flooring). Returns boolean
    selectors and the threshold values; the reference asserts
    low != high (TrainHandler.py:1166)."""
    order = jnp.argsort(preds)
    n = preds.shape[0]
    high = preds[order[min(n - 1, int(round(hi * 100)) * n // 100)]]
    low = preds[order[min(n - 1, int(round(lo * 100)) * n // 100)]]
    return {"high": high, "low": low,
            "highsel": preds >= high, "lowsel": preds <= low}


# ---------------------------------------------------------------------------
# dist-norm loss (TrainHandler.py:1270-1287)
# ---------------------------------------------------------------------------

def distnorm_loss(z: Array, fixed: bool = False) -> Array:
    """Centroid-pull: per-mask centroid votes from coordinate grids,
    target = clamp(mask - dist, 0), loss = 5 * MSE(mask, target).
    z: (B, H, W, 1). fixed=False reproduces the reference's
    `sqrt(xs^2 + xs^2)` typo (y-distance ignored)."""
    b, h, w, _ = z.shape
    mask = jax.lax.stop_gradient(z)
    xs = jnp.broadcast_to(jnp.arange(w, dtype=z.dtype) / w,
                          (b, h, w))[..., None]
    ys = jnp.broadcast_to((jnp.arange(h, dtype=z.dtype) / h)[:, None],
                          (b, h, w))[..., None]
    xvote = (xs * mask).mean(axis=(1, 2), keepdims=True)
    yvote = (ys * mask).mean(axis=(1, 2), keepdims=True)
    dx = xs - xvote
    dy = ys - yvote
    second = dy if fixed else dx          # TrainHandler.py:1283 typo
    dist = jnp.sqrt(dx ** 2 + second ** 2)
    target = jnp.maximum(mask - dist, 0.0)
    return 5.0 * jnp.mean((z - target) ** 2)


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """torch F.binary_cross_entropy_with_logits (mean)."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


# ---------------------------------------------------------------------------
# old single-net `segment` step (TrainHandler.py:1697-1894)
# ---------------------------------------------------------------------------

def make_single_net_merge_step(
        unet, tx: optax.GradientTransformation, *,
        threshold: float = 0.9, l1: float = 0.0, l2: float = 0.0,
        staticnorm: bool = False, distnorm: bool = False,
        live: bool = False, n_cluster_channels: int = 0
) -> Callable:
    """One jitted step of the old merge training: the U-Net masks its
    own batch, negatives come from within the batch
    (pred < 1 - threshold, sampled in-graph), and the single replace
    merge is pushed to zero critic logit via BCE-with-logits
    (TrainHandler.py:1750-1770).

    n_cluster_channels > 0 enables the `-clustercritic` variant: the
    critic scores concat(frames, cluster_layers) and the merge also
    merges the layers (TrainHandler.py:1763-1767); the zoo Unet must
    then be built with colorchs=3+n_cluster_channels.

    Gradient topology parity: the reference's optimizer covers the
    U-Net only — the external critic is NOT in `opti`
    (TrainHandler.py:1703-1704), so merge-score gradients reach the
    mask solely through Z and can never collapse the critic. With one
    shared net here, the same topology is enforced by scoring merges
    (and pred) with a weight-stopped parameter snapshot; only the
    live critic loss (the reference's separate critic_opti,
    :1742-1746) trains the critic head.

    Returns step(params, opt_state, x, y, key[, channels])
    -> (params, opt_state, metrics)."""

    def forward_critic(params, frames, channels):
        inp = frames if channels is None else jnp.concatenate(
            [frames, channels], axis=-1)
        return unet.apply({"params": params}, inp,
                          critic=True).squeeze(-1)

    def loss_fn(params, x, y, key, channels):
        # critic weights frozen for scoring (see docstring)
        fparams = jax.lax.stop_gradient(params)
        pred_raw = forward_critic(fparams, x, channels)
        pred = jax.nn.sigmoid(pred_raw)
        # reference quirk: BCE-with-logits ON THE SIGMOIDED pred
        # (TrainHandler.py:1742-1743) — double squashing, preserved
        critic_loss = (bce_with_logits(
            jax.nn.sigmoid(forward_critic(params, x, channels)), y)
            if live else 0.0)

        negmask = jax.lax.stop_gradient(pred) < (1.0 - threshold)
        logits = jnp.where(negmask, 0.0, -jnp.inf)
        # all-positive batch fallback: uniform (the reference `continue`s;
        # jit needs fixed control flow — metrics report n_neg for callers)
        logits = jnp.where(jnp.any(negmask), logits,
                           jnp.zeros_like(logits))
        negatives = jax.random.categorical(
            key, logits, shape=(x.shape[0],))

        a = x
        b = x[negatives]
        zin = a if channels is None else jnp.concatenate(
            [a, channels], axis=-1)
        z = unet.apply({"params": params}, zin)
        merged = a * (1 - z) + z * b
        if channels is None:
            mergevalue = forward_critic(fparams, merged, None)
        else:
            mergechs = channels * (1 - z) + z * channels[negatives]
            mergevalue = forward_critic(fparams, merged, mergechs)
        valueloss = bce_with_logits(mergevalue,
                                    jnp.zeros_like(mergevalue))
        loss = valueloss + critic_loss

        valuefak = 1.0 if staticnorm else (
            1.0 - jax.lax.stop_gradient(pred).reshape(-1, 1, 1, 1))
        norm = 0.0
        if l1:                              # L1 wins over L2 (elif)
            norm = l1 * jnp.mean(jnp.abs(valuefak * z))
        elif l2:
            norm = l2 * jnp.mean((valuefak * z) ** 2)
        loss = loss + norm
        if distnorm:
            loss = loss + distnorm_loss(z)
        metrics = {"loss": loss, "value": valueloss, "norm": norm,
                   "critic": critic_loss,
                   "n_neg": jnp.sum(negmask).astype(jnp.float32)}
        return loss, metrics

    @jax.jit
    def step(params, opt_state, x, y, key, channels=None):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, key, channels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# contrastive_merge_segmentation_old step (TrainHandler.py:1098-1421)
# ---------------------------------------------------------------------------

def make_pair_merge_step(
        unet, tx: optax.GradientTransformation, *,
        lfak: float = 1.0, clossfak: float = 1.0, l1: float = 0.0,
        l2: float = 0.0, staticnorm: bool = False,
        distnorm: bool = False, inject: bool = True,
        live: bool = False, use_copy: bool = False
) -> Callable:
    """One jitted step of the percentile-split pair training: batches
    are [high || low] frames (callers split with `percentile_split`),
    negatives are random low frames, the U-Net's own critic head
    scores merges (the `-ucritic` path — the variant the reference can
    actually run; the external-critic path is main.py's modern loop).

    Critic freezing parity (TrainHandler.py:1107-1113, 1226):

      * live=True, use_copy=False — merges scored by the LIVE net
        with gradients (the reference's `critic = lambda x:
        self.unet.forward(x, critic=True)`; opti covers all params).
      * live=True, use_copy=True — merges scored by a per-call
        deepcopy (:1110) == per-step weight-stop-grad here (the
        snapshot equals current params, receives no gradient).
      * live=False — the reference freezes ONE deepcopy at setup
        (:1112) and scores everything with it for the whole run. Pass
        that snapshot as `frozen_params` to step() for exact
        semantics; when omitted, a per-step weight-stopped snapshot
        is used (targets track the current params instead of init —
        documented approximation, still collapse-proof).

    live adds clossfak * MSE(sigmoid-free critic score, y)
    (TrainHandler.py:1215-1222 `-ucritic` branch folds it into the
    joint loss)."""

    def critic_score(params, frames):
        return unet.apply({"params": params}, frames,
                          critic=True).squeeze(-1)

    def loss_fn(params, a, y, b, frozen_params):
        fparams = (jax.lax.stop_gradient(params)
                   if frozen_params is None else frozen_params)
        # non-live: ALL scoring uses the frozen critic (:1112-1113)
        score_params = params if live else fparams
        merge_params = fparams if (use_copy or not live) else params
        pred = critic_score(score_params, a)
        negpred = critic_score(score_params, b)

        loss = 0.0
        critic_loss = jnp.mean((pred - y) ** 2)
        if live:
            loss = loss + clossfak * critic_loss

        z = unet.apply({"params": params}, a)
        replaced = a * (1 - z) + z * b
        replacevalue = critic_score(merge_params, replaced)
        replaceloss = jnp.mean(
            (replacevalue - jax.lax.stop_gradient(negpred)) ** 2)
        loss = loss + lfak * replaceloss

        injectloss = 0.0
        if inject:
            injected = b * (1 - z) + z * a
            injectvalue = critic_score(merge_params, injected)
            injectloss = jnp.mean(
                (injectvalue - jax.lax.stop_gradient(pred)) ** 2)
            loss = loss + lfak * injectloss

        valuefak = 1.0 if staticnorm else (
            1.0 - jax.lax.stop_gradient(pred).reshape(-1, 1, 1, 1))
        norm = 0.0
        if not l2:                         # L2 flag wins here (:1261)
            norm = l1 * jnp.mean(jnp.abs(valuefak * z))
        else:
            norm = l2 * jnp.mean((valuefak * z) ** 2)
        loss = loss + norm
        if distnorm:
            loss = loss + distnorm_loss(z)

        return loss, {"loss": loss, "replace": replaceloss,
                      "inject": injectloss, "norm": norm,
                      "critic": critic_loss}

    @jax.jit
    def step(params, opt_state, a, y, b, frozen_params=None):
        # no key/negy args: the pair variant consumes a PRE-SAMPLED
        # contrast pair (a, b) like the reference's loop
        # (TrainHandler.py:1163-1175) — in-graph negative sampling is
        # the single-net variant's mechanism (make_single_net_merge_step)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, a, y, b, frozen_params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step
