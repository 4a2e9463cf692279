"""Reward critic CNN (TPU-native Flax rebuild of `nets.py:160-212`
`NewCritic`).

Architecture parity with the reference:
  * 4 blocks of [3x3 SAME conv, ReLU, 2x2 max-pool] with channel
    schedule `dims * chfak` (default [8, 8, 8, 16], nets.py:161);
  * Dropout after pools 3 and 4 (nets.py:179,183);
  * 4x4 VALID "bottleneck" conv to `neck*chfak` channels at 1x1 spatial
    + ReLU (nets.py:184-185);
  * head: Flatten -> Dense(neck) -> ReLU -> Dropout -> Dense(1) ->
    **Sigmoid** (nets.py:188-195 — sigmoid + MSE regression is a
    deliberate design choice of the reference; do not switch to logits);
  * `collect=True` additionally returns the 5-entry feature pyramid
    [post-pool1..4, bottleneck] that feeds the masker's skip
    connections (nets.py:197-206). Embeds are taken post-pool,
    *before* dropout, matching the reference layer order.

Differences by design (TPU-first):
  * NHWC layout (XLA-preferred on TPU) instead of NCHW;
  * optional bfloat16 compute with float32 params and a float32
    sigmoid head.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from cgs_tpu.core.init import make_torch_bias_init, torch_kernel_init

Array = jnp.ndarray


class Critic(nn.Module):
    """Discounted-reward regressor on 64x64x3 frames in [0, 1]."""

    dims: Sequence[int] = (8, 8, 8, 16)
    bottleneck: int = 32
    colorchs: int = 3
    chfak: int = 1
    dropout: float = 0.3
    compute_dtype: jnp.dtype = jnp.float32

    def _conv(self, features: int, kernel: int, padding: str,
              in_ch: int, name: str) -> nn.Conv:
        kshape = (kernel, kernel, in_ch, features)
        return nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(1, 1),
            padding=padding,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(kshape),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    def _dense(self, features: int, in_ch: int, name: str) -> nn.Dense:
        return nn.Dense(
            features=features,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init((in_ch, features)),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(self, x: Array, collect: bool = False,
                 deterministic: bool = True,
                 ) -> Union[Array, Tuple[Array, List[Array]]]:
        """x: (B, 64, 64, 3) float in [0, 1]. Returns sigmoid pred (B, 1)
        and, when collect=True, the skip-connection feature pyramid."""
        dims = tuple(d * self.chfak for d in self.dims)
        neck = self.bottleneck * self.chfak
        x = x.astype(self.compute_dtype)

        embeds: List[Array] = []
        in_ch = self.colorchs
        for i, d in enumerate(dims):
            x = self._conv(d, 3, "SAME", in_ch, f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            embeds.append(x)  # post-pool, pre-dropout (nets.py:200-203)
            # dropout after pools 3 and 4 only (nets.py:179,183)
            if i >= 2:
                x = nn.Dropout(self.dropout, deterministic=deterministic,
                               name=f"drop{i}")(x)
            in_ch = d

        # 4x4 VALID conv: (B,4,4,dims[3]) -> (B,1,1,neck)  (nets.py:184)
        x = self._conv(neck, 4, "VALID", dims[3], "conv_neck")(x)
        x = nn.relu(x)
        embeds.append(x)  # bottleneck tap (nets.py:205)

        # critic head (nets.py:188-195)
        h = x.reshape((x.shape[0], -1))
        h = self._dense(neck, neck, "fc0")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic,
                       name="drop_head")(h)
        h = self._dense(1, neck, "fc1")(h)
        pred = nn.sigmoid(h.astype(jnp.float32))

        if collect:
            return pred, embeds
        return pred
