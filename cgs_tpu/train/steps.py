"""Jitted training steps.

Each phase of the reference's two-stage pipeline becomes ONE fused XLA
program per step — batch ingest (uint8 -> f32/255), augmentation,
all forward passes, every loss branch, backward, and the Adam update —
instead of the reference's host-driven op soup (main.py:182-199 critic,
main.py:340-463 masker).

Masker-step gradient topology (the hard part, SURVEY.md §7.3):

    pred, embeds = critic(A)        # grads flow (live) through pred AND
    negpred      = critic(B)        #   through embeds into Z
    Z            = masker(A, embeds[or sepcrit(A) embeds if separate])
    replaceloss  = MSE(critic(A(1-Z)+ZB), stop_grad(negpred))
    injectloss   = MSE(critic(B(1-Z)+ZA), stop_grad(pred))
    sparsity     = L1*mean|vf*Z| + L2*mean((vf*Z)^2),
                   vf = 1 (staticnorm) or 1 - stop_grad(pred)
    critic_loss  = lfak * MSE(pred, Y)          (live only)

stop-gradient placement matches main.py:367,400,411,418. In frozen
mode ('-frozen') critic params are simply not differentiated — the
reference computes-then-discards those grads by excluding them from the
optimizer (main.py:330-334); results are identical.

Data parallelism: steps are jitted over a ('data','model') mesh with
batch args sharded on 'data' and state replicated; XLA inserts the
gradient all-reduce over ICI (see cgs_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from cgs_tpu.ops.augment import shift_batch
from cgs_tpu.ops.merge import inject_merge, replace_merge

Array = jnp.ndarray


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: optax.OptState
    step: Array


def make_optimizer() -> optax.GradientTransformation:
    """torch.optim.Adam defaults (main.py:178,331 pass no lr):
    lr=1e-3, betas=(0.9, 0.999), eps=1e-8."""
    return optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)


def _mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def _bce(pred: Array, target: Array) -> Array:
    """F.binary_cross_entropy on sigmoid outputs (main.py:193,381),
    with torch's clamp of the log terms at -100."""
    eps = 1e-12
    logp = jnp.maximum(jnp.log(pred + eps), -100.0)
    lognp = jnp.maximum(jnp.log1p(-pred + eps), -100.0)
    return -jnp.mean(target * logp + (1.0 - target) * lognp)


def _ingest(x_u8: Array) -> Array:
    """uint8 NHWC -> float32 [0,1] (main.py:189 `.float()/255`)."""
    return x_u8.astype(jnp.float32) * (1.0 / 255.0)


# ---------------------------------------------------------------------
# critic phase (main.py:158-236)
# ---------------------------------------------------------------------

def make_critic_step(cfg, critic, tx: optax.GradientTransformation,
                     mesh=None) -> Callable:
    """Returns jitted step: (state, x_u8 (B,64,64,3), y (B,), key) ->
    (state, loss)."""
    use_bce = bool(cfg.threshrew)
    use_shift = bool(cfg.shift)
    max_shift = int(cfg.shift)

    def loss_fn(cparams, x, y, dkey):
        pred = critic.apply({"params": cparams}, x, deterministic=False,
                            rngs={"dropout": dkey})
        pred = pred.squeeze(-1)
        return _bce(pred, y) if use_bce else _mse(pred, y)

    def step(state: TrainState, x_u8: Array, y: Array,
             key: jax.Array) -> Tuple[TrainState, Array]:
        skey, dkey = jax.random.split(key)
        if use_shift:
            x_u8 = shift_batch(skey, x_u8, max_shift)
        x = _ingest(x_u8)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["critic"], x, y, dkey)
        updates, opt_state = tx.update(
            {"critic": grads}, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return _jit_step(step, mesh, n_batch_args=2)


# ---------------------------------------------------------------------
# masker phase (main.py:314-463)
# ---------------------------------------------------------------------

def make_masker_step(cfg, critic, masker,
                     tx: optax.GradientTransformation,
                     mesh=None) -> Callable:
    """Returns jitted step:
    (state, a_u8 (2K,...), y (2K,), b_u8 (2K,...), key) ->
    (state, metrics dict). a is [K high || K low] frames (main.py:350),
    b is 2K contrast-negative frames."""
    live = bool(cfg.live)
    inject = bool(cfg.inject)
    separate = bool(cfg.separate)
    staticnorm = bool(cfg.staticnorm)
    use_bce = bool(cfg.threshrew)
    use_shift = bool(cfg.shift)
    max_shift = int(cfg.shift)
    l1 = float(cfg.L1)
    l2 = float(cfg.L2)
    lfak = float(cfg.lfak)

    def apply_critic(cparams, x, dkey, collect=False):
        return critic.apply({"params": cparams}, x, collect=collect,
                            deterministic=False, rngs={"dropout": dkey})

    def loss_fn(trainable, constant, a, y, b, dkey):
        p = {**constant, **trainable}
        k = jax.random.split(dkey, 5)
        pred, embeds = apply_critic(p["critic"], a, k[0], collect=True)
        pred = pred.squeeze(-1)
        negpred = jax.lax.stop_gradient(
            apply_critic(p["critic"], b, k[1]).squeeze(-1))

        metrics = {}
        loss = 0.0
        if live:  # main.py:378-385
            closs = _bce(pred, y) if use_bce else _mse(pred, y)
            loss = loss + lfak * closs
            metrics["critic"] = closs

        if separate:  # main.py:389-390: masker sees sepcrit's embeds
            _, embeds = apply_critic(p["sepcrit"], a, k[2], collect=True)

        z = masker.apply({"params": p["masker"]}, a, embeds)

        replaced = replace_merge(a, b, z)            # main.py:395
        replacevalue = apply_critic(p["critic"], replaced,
                                    k[3]).squeeze(-1)
        replaceloss = _mse(replacevalue, negpred)    # main.py:400
        loss = loss + replaceloss
        metrics["replace"] = replaceloss

        if inject:  # main.py:405-413
            injected = inject_merge(a, b, z)
            injectvalue = apply_critic(p["critic"], injected,
                                       k[4]).squeeze(-1)
            injectloss = _mse(injectvalue, jax.lax.stop_gradient(pred))
            loss = loss + injectloss
            metrics["inject"] = injectloss
        else:
            metrics["inject"] = jnp.asarray(0.0)

        # sparsity (main.py:415-429)
        if staticnorm:
            vf = 1.0
        else:
            vf = 1.0 - jax.lax.stop_gradient(
                pred)[:, None, None, None]
        norm = jnp.asarray(0.0)
        if l1:
            norm = norm + l1 * jnp.mean(jnp.abs(vf * z))
        if l2:
            norm = norm + l2 * jnp.mean((vf * z) ** 2)
        loss = loss + norm
        metrics["norm"] = norm
        metrics["loss"] = loss
        return loss, metrics

    trained_keys = ["masker"] + (["critic"] if live else []) + (
        ["sepcrit"] if separate else [])

    def step(state: TrainState, a_u8: Array, y: Array, b_u8: Array,
             key: jax.Array):
        skey, dkey = jax.random.split(key)
        if use_shift:  # only A is shifted (main.py:355-357)
            a_u8 = shift_batch(skey, a_u8, max_shift)
        a = _ingest(a_u8)
        b = _ingest(b_u8)
        trainable = {n: state.params[n] for n in trained_keys}
        constant = {n: v for n, v in state.params.items()
                    if n not in trained_keys}
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, constant, a, y, b, dkey)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        params = {**state.params, **new_trainable}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return _jit_step(step, mesh, n_batch_args=3)


# ---------------------------------------------------------------------
# jit / mesh plumbing
# ---------------------------------------------------------------------

def _jit_step(step: Callable, mesh, n_batch_args: int) -> Callable:
    """jit a step function; with a mesh, shard batch args over 'data'
    and replicate state + rng."""
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    in_shardings = (repl,) + (data,) * n_batch_args + (repl,)
    return jax.jit(step, in_shardings=in_shardings,
                   donate_argnums=(0,))


def init_train_state(params: Dict[str, Any],
                     tx: optax.GradientTransformation,
                     trained_keys=None) -> TrainState:
    """Fresh optimizer state over the trained parameter subset
    (the reference creates a new Adam per phase, main.py:178,330-334)."""
    if trained_keys is None:
        target = params
    else:
        target = {n: params[n] for n in trained_keys}
    return TrainState(params=params, opt_state=tx.init(target),
                      step=jnp.asarray(0, jnp.int32))
