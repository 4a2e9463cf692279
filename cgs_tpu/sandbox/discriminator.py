"""Binary frame discriminator (reference `train_water_discriminator`,
TrainHandler.py:503-566): classify frames from two banks (water env
vs treechop) with sigmoid + BCE. Generic over any two frame sources.
"""

from __future__ import annotations

from typing import Callable

import jax

import optax

from cgs_tpu.train.losses import bce, ingest
from cgs_tpu.train.steps import TrainState


def make_discriminator_step(critic,
                            tx: optax.GradientTransformation,
                            ) -> Callable:
    """Jitted: (state, x_u8 (B,...), labels (B,), key) ->
    (state, loss). Labels 1 = positive class (e.g. water frames)."""

    def loss_fn(cparams, x, y, dkey):
        pred = critic.apply({"params": cparams}, x,
                            deterministic=False,
                            rngs={"dropout": dkey}).squeeze(-1)
        return bce(pred, y)

    def step(state: TrainState, x_u8, y, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params["critic"], ingest(x_u8), y, key)
        updates, opt_state = tx.update({"critic": grads},
                                       state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))
