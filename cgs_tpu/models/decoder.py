"""U-Net mask decoder (TPU-native Flax rebuild of `nets.py:452-523`
`UnetDecoder`).

Consumes the critic's 5-entry feature pyramid and emits a 1-channel
sigmoid mask at input resolution. Wiring parity with the reference
forward pass (nets.py:494-523):

    out4 = 1x1 conv(bottleneck -> bottleneck) on embeds[4]      # 1x1
    in3  = concat(embeds[3], up(up(out4)));  out3 = 3x3 conv    # 4x4
    in2  = concat(embeds[2], up(out3));      out2 = 3x3 conv    # 8x8
    in1  = concat(embeds[1], up(out2));      out1 = 3x3 conv    # 16x16
    in0  = concat(embeds[0], up(out1));      out0 = 3x3 conv    # 32x32
    mask = sigmoid(conv(leaky_relu(conv(concat(X, up(out0))))))  # 64x64

IMPORTANT parity detail: the reference applies **no activation** between
the decoder convs — `self.acti` (LeakyReLU 0.01) is bound in forward but
only ever used inside the masker head Sequential (nets.py:487-492).
We reproduce that exactly.

Upsampling is x2 nearest-neighbor (torch nn.Upsample default,
nets.py:463), implemented as integer `jnp.repeat` — exact and cheap on
the VPU, fused by XLA into the adjacent concat+conv.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cgs_tpu.core.init import make_torch_bias_init, torch_kernel_init

Array = jnp.ndarray


def upsample2x(x: Array) -> Array:
    """Nearest-neighbor x2 upsample, NHWC (jnp path).

    Two chained jnp.repeat calls on purpose: a measured 6-D
    single-broadcast+reshape variant (write the (B,H,2,W,2,C) tensor
    once) was 23% SLOWER end-to-end on v5e (605k -> 465k frames/s) —
    the reshape forces a relayout of the (8,128)-tiled intermediate,
    while XLA lowers the repeat chain to two well-tiled broadcasts
    (profiled at 420 GB/s each). See RESULTS.md roofline notes.

    The Pallas single-pass kernel (ops/pallas_upsample.py) beats this
    path 2.9x at the big 32->64 stage by skipping the intermediate
    HBM round-trip; `UnetDecoder.use_pallas_upsample` selects it."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _auto_pallas_upsample() -> bool:
    """Default OFF. The Pallas single-pass upsample wins 2.9x on the
    op in isolation (ops/pallas_upsample.py), but wiring it into this
    module is a net LOSS at production batch: the custom-call output
    must cross back into XLA as a (B, 2H, 2W, C) tensor, and XLA's
    layout assignment at that seam picks a 16x-padded (8, 128) tiling
    over the (W=64, C=8) minor dims — a 34 GB allocation at batch
    32768 (compile-time OOM; verified 2026-08). Every workaround
    (4-D pallas output, NCHW emission + transpose, lane-split
    reshapes in-kernel) either hits Mosaic's unsupported-shape-cast
    wall or re-inserts an equivalent relayout. Kept opt-in for
    callers that consume the upsampled tensor without a conv. See
    RESULTS.md round-2 notes."""
    return False


class UnetDecoder(nn.Module):
    """Decoder-only U-Net over critic skip features (nets.py:452-523)."""

    edims: Sequence[int] = (8, 8, 8, 16)
    ddims: Sequence[int] = (8, 8, 8, 16)
    bottleneck: int = 32
    masker_channels: int = 16   # NOT scaled by chfak (nets.py:466)
    colorchs: int = 3
    chfak: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    # None = default OFF (the Pallas kernel loses at the XLA layout
    # seam — see _auto_pallas_upsample); True opts in explicitly
    use_pallas_upsample: Optional[bool] = None

    def _conv(self, features: int, kernel: int, in_ch: int,
              name: str) -> nn.Conv:
        kshape = (kernel, kernel, in_ch, features)
        return nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(1, 1),
            padding="SAME" if kernel > 1 else "VALID",
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(kshape),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(self, x: Array, embeds: List[Array]) -> Array:
        """x: (B, 64, 64, 3) in [0,1]; embeds: critic pyramid.
        Returns mask (B, 64, 64, 1) in (0, 1)."""
        edims = tuple(d * self.chfak for d in self.edims)
        ddims = tuple(d * self.chfak for d in self.ddims)
        neck = self.bottleneck * self.chfak
        x = x.astype(self.compute_dtype)
        embeds = [e.astype(self.compute_dtype) for e in embeds]

        pallas_up = (self.use_pallas_upsample
                     if self.use_pallas_upsample is not None
                     else _auto_pallas_upsample())

        def up2(h: Array) -> Array:
            if pallas_up:
                from cgs_tpu.ops.pallas_upsample import (
                    supports_pallas_upsample, upsample2x_pallas)
                if supports_pallas_upsample(h):
                    return upsample2x_pallas(h)
            return upsample2x(h)

        # dec[4]: 1x1 conv on the bottleneck (nets.py:484,501)
        out4 = self._conv(neck, 1, neck, "dec4")(embeds[4])

        # dec[3]: bottleneck upped x4 (two x2 ups, nets.py:503)
        in3 = jnp.concatenate([embeds[3], up2(up2(out4))],
                              axis=-1)
        out3 = self._conv(ddims[3], 3, edims[3] + neck, "dec3")(in3)

        in2 = jnp.concatenate([embeds[2], up2(out3)], axis=-1)
        out2 = self._conv(ddims[2], 3, edims[2] + ddims[3], "dec2")(in2)

        in1 = jnp.concatenate([embeds[1], up2(out2)], axis=-1)
        out1 = self._conv(ddims[1], 3, edims[1] + ddims[2], "dec1")(in1)

        in0 = jnp.concatenate([embeds[0], up2(out1)], axis=-1)
        out0 = self._conv(ddims[0], 3, edims[0] + ddims[1], "dec0")(in0)

        # masker head: re-ground on the RGB input (nets.py:487-492,520-521)
        inout = jnp.concatenate([x, up2(out0)], axis=-1)
        h = self._conv(self.masker_channels, 3,
                       self.colorchs + ddims[0], "mask0")(inout)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = self._conv(1, 3, self.masker_channels, "mask1")(h)
        return nn.sigmoid(h.astype(jnp.float32))
