"""TD(0)-bootstrapped critic training (reference
`contrastive_critic_pipe`, TrainHandler.py:568-747).

Instead of regressing precomputed discounted returns, the critic
bootstraps its own target from the frame `fskip` steps later:

    V_target = r_t + etha * stop_grad(V(s_{t+fskip}))
    loss     = MSE(V(s_t), V_target)            (TrainHandler.py:660-661)

One jitted step: both forwards + loss + Adam update.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cgs_tpu.ops.augment import shift_batch
from cgs_tpu.train.losses import ingest
from cgs_tpu.train.steps import TrainState


def sarsa_pairs(x: np.ndarray, y_raw: np.ndarray, i: np.ndarray,
                fskip: int = 1) -> Tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """(idx_t, idx_tp, r_t) index pairs within episodes — the
    `collect_sarsa_dataset` contract (TrainHandler.py:3121-3427)
    expressed over the standard (X, Y, I) arrays. Episode boundaries
    are where the frame-in-episode counter I resets."""
    n = len(x)
    ok = np.arange(n - fskip)
    same_ep = i[ok + fskip].astype(np.int64) - i[ok].astype(np.int64) \
        == fskip
    t = ok[same_ep]
    return t.astype(np.int32), (t + fskip).astype(np.int32), \
        y_raw[t].astype(np.float32)


def make_td_critic_step(cfg, critic, tx: optax.GradientTransformation,
                        etha: float = 0.98) -> Callable:
    """Jitted: (state, x_t u8, x_tp u8, r (B,), key) -> (state, loss)."""
    use_shift = bool(cfg.shift)
    max_shift = int(cfg.shift)

    def loss_fn(cparams, xt, xtp, r, dkey):
        k1, k2 = jax.random.split(dkey)
        pred = critic.apply({"params": cparams}, xt,
                            deterministic=False,
                            rngs={"dropout": k1}).squeeze(-1)
        pred2 = critic.apply({"params": cparams}, xtp,
                             deterministic=False,
                             rngs={"dropout": k2}).squeeze(-1)
        v_target = r + etha * jax.lax.stop_gradient(pred2)
        return jnp.mean((pred - v_target) ** 2)

    def step(state: TrainState, xt_u8, xtp_u8, r, key):
        sk1, sk2, dkey = jax.random.split(key, 3)
        if use_shift:  # both frames shifted (TrainHandler.py:642-644)
            xt_u8 = shift_batch(sk1, xt_u8, max_shift)
            xtp_u8 = shift_batch(sk2, xtp_u8, max_shift)
        xt, xtp = ingest(xt_u8), ingest(xtp_u8)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["critic"], xt, xtp, r, dkey)
        updates, opt_state = tx.update({"critic": grads},
                                       state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))
