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

For epoch-granularity device-resident training (the fast path given
dispatch latency), see cgs_tpu/train/loops.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from cgs_tpu.ops.augment import shift_batch
from cgs_tpu.train.losses import build_critic_loss, build_masker_loss, ingest

Array = jnp.ndarray


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: optax.OptState
    step: Array


def make_optimizer(critic_update_scale: float = 1.0,
                   ) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (main.py:178,331 pass no lr):
    lr=1e-3, betas=(0.9, 0.999), eps=1e-8.

    critic_update_scale (framework extension, `--critic-lr-scale`,
    masker phase only — no reference analogue): multiply the CRITIC
    subtree's updates by a constant. 1.0 (default) is the exact
    reference parity path (plain Adam, bit-identical); 0.0 makes the
    live critic's params immovable (== `-frozen` dynamics with the
    optimizer still stepping); intermediate values slow the critic's
    prediction-invariant feature walk that collapses the full model
    at long masker horizons (RESULTS.md "The collapse mechanism,
    measured"). The mask keys off the top-level 'critic' entry of
    whatever target the optimizer was init'd with, so it is a no-op
    for -frozen/-separate states that do not train the critic, and it
    rides the seed axis under the vmapped seed-parallel trainer."""
    adam = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    if critic_update_scale == 1.0:
        return adam

    def critic_mask(params):
        return {k: jax.tree.map(lambda _: k == "critic", v)
                for k, v in params.items()}

    return optax.chain(adam, optax.masked(
        optax.scale(float(critic_update_scale)), critic_mask))


def trained_param_keys(cfg) -> list:
    """Which sub-trees the masker-phase optimizer trains
    (main.py:330-334)."""
    return ["masker"] + (["critic"] if cfg.live else []) + (
        ["sepcrit"] if cfg.separate else [])


# ---------------------------------------------------------------------
# critic phase (main.py:158-236)
# ---------------------------------------------------------------------

def make_critic_step(cfg, critic, tx: optax.GradientTransformation,
                     mesh=None) -> Callable:
    """Returns jitted step: (state, x_u8 (B,64,64,3), y (B,), key) ->
    (state, loss)."""
    loss_fn = build_critic_loss(cfg, critic)
    use_shift = bool(cfg.shift)
    max_shift = int(cfg.shift)

    def step(state: TrainState, x_u8: Array, y: Array,
             key: jax.Array) -> Tuple[TrainState, Array]:
        skey, dkey = jax.random.split(key)
        if use_shift:
            x_u8 = shift_batch(skey, x_u8, max_shift)
        x = ingest(x_u8)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["critic"], x, y, dkey)
        updates, opt_state = tx.update(
            {"critic": grads}, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return _jit_step(step, mesh, n_batch_args=2,
                     batch=int(cfg.batch_size))


# ---------------------------------------------------------------------
# masker phase (main.py:314-463)
# ---------------------------------------------------------------------

def make_masker_step(cfg, critic, masker,
                     tx: optax.GradientTransformation,
                     mesh=None, fuse: str = "both") -> Callable:
    """Returns jitted step:
    (state, a_u8 (2K,...), y (2K,), b_u8 (2K,...), key) ->
    (state, metrics dict). a is [K high || K low] frames (main.py:350),
    b is 2K contrast-negative frames. fuse: see build_masker_loss."""
    # plain jnp merges: measured faster than the fused Pallas pair
    # (XLA fuses them into the critic convs; see ops/pallas_kernels.py)
    loss_fn = build_masker_loss(cfg, critic, masker, fuse=fuse)
    use_shift = bool(cfg.shift)
    max_shift = int(cfg.shift)
    trained_keys = trained_param_keys(cfg)

    def step(state: TrainState, a_u8: Array, y: Array, b_u8: Array,
             key: jax.Array):
        skey, dkey = jax.random.split(key)
        if use_shift:  # only A is shifted (main.py:355-357)
            a_u8 = shift_batch(skey, a_u8, max_shift)
        a = ingest(a_u8)
        b = ingest(b_u8)
        trainable = {n: state.params[n] for n in trained_keys}
        constant = {n: v for n, v in state.params.items()
                    if n not in trained_keys}
        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, constant, a, y, b, dkey)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        params = {**state.params, **new_trainable}
        metrics = {k: aux[k] for k in
                   ("replace", "inject", "norm", "critic", "loss")}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    # the masker batch is the fixed 2K=64 contrastive draw
    # (main.py:306,350) — K=32 is hard-coded in the reference
    return _jit_step(step, mesh, n_batch_args=3, batch=64)


# ---------------------------------------------------------------------
# jit / mesh plumbing
# ---------------------------------------------------------------------

def _jit_step(step: Callable, mesh, n_batch_args: int,
              batch: int = None) -> Callable:
    """jit a step function; with a mesh, shard batch args over 'data'
    and replicate state + rng. The sharded/replicated choice is made
    per CALL on the runtime leading dim (`batch` is only the expected
    size, and e.g. a tail batch of an externally-driven loop can be
    smaller): a non-divisible batch falls back to replicated placement
    (correct math on every chip) instead of jit's cryptic
    divisibility ValueError at dispatch — the same degradation rule
    as parallel/mesh.py:index_sharding. Both variants share one traced
    step; each compiles at most once per shape."""
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = {
        sh: jax.jit(step,
                    in_shardings=(repl,) + (sh,) * n_batch_args + (repl,),
                    donate_argnums=(0,))
        for sh in (data, repl)
    }
    n_data = mesh.shape["data"]

    def dispatch(state, *args):
        batch_args = args[:n_batch_args]
        ok = all(a.shape[0] % n_data == 0 for a in batch_args)
        return jitted[data if ok else repl](state, *args)

    return dispatch


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
