"""int8 inference quantization for the mask pipeline (-process/-eval).

Round-2/round-5 probes measured the int8 MXU path at 1.28x (chfak=1)
and 1.52x (chfak=5) over bf16 on the dominant mask0-shaped conv in
isolation (RESULTS.md roofline notes); this module ships that as an
opt-in end-to-end path: `MaskPipeline(..., quantize="int8")`.

Scheme (standard post-training quantization, no reference analogue —
the reference serves f32 torch on CPU, main.py:1130-1151):
  * weights: per-output-channel symmetric int8
    (`scale[oc] = max|K[..., oc]| / 127`), quantized ONCE per
    `update_params` — the f32 kernels never ride dispatches;
  * activations: per-tensor symmetric int8. Two modes:
      - DYNAMIC (default): in-graph `max|x| / 127` per conv input.
        Calibration-free and clip-safe, but the full-tensor reduce is
        a dependency barrier + an extra HBM pass per conv — measured
        0.73x end-to-end at chfak=5 (the reduce eats the MXU win);
      - STATIC (`calibrate_act_scales` + `merge_act_scales`, or
        `MaskPipeline(..., quantize="int8", calib=frames)`): scales
        are baked from a calibration batch's per-conv max|input|, so
        the quantize is a pure elementwise op that fuses into the
        producing relu/concat — no reduce, no barrier. Out-of-range
        activations on unseen data clip at ±127 (saturating, the
        standard PTQ behavior);
  * convolutions run s8 x s8 -> s32 on the MXU
    (`preferred_element_type=int32`), then rescale + bias in f32;
  * the tiny dense head (neck x neck and neck x 1) and all
    elementwise glue (relu, max-pool, upsample, concat, sigmoid)
    stay in the pipeline's compute dtype — they are bandwidth-bound,
    not MXU-bound, and quantizing them buys nothing.

Eval-only by construction: int8 convs have no useful gradient, so the
pipeline rejects `quantize="int8"` combined with saliency (input
gradients, main.py:949-953) or `-noevalmode` live dropout.

The functional forwards below mirror `models/critic.py::Critic`
(nets.py:160-212) and `models/decoder.py::UnetDecoder`
(nets.py:452-523) in their deterministic eval configuration; the
`mode="f32"` escape hatch runs the same skeleton with exact f32 convs
on the raw params, which the tests use to pin the wiring against
`flax.apply` bit-for-bit before trusting the int8 numbers.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

_DN = ("NHWC", "HWIO", "NHWC")


def _is_conv_kernel(path, leaf) -> bool:
    """HWIO conv kernels are ndim 4 (5 with a leading ensemble seed
    axis); dense kernels are 2 (3 seeded). Biases are 1-D."""
    return path[-1].key == "kernel" and leaf.ndim >= 4


def quantize_tree(params, only=None):
    """f32 flax param tree -> int8-quantized tree.

    Each conv kernel leaf K (..., H, W, I, O) becomes the pair
    `kernel_q` (int8, same shape) + `kernel_scale` (f32, (..., O)):
    per-output-channel symmetric quantization over the (H, W, I)
    reduction axes (negative axes, so a leading ensemble seed axis
    passes straight through — no vmap needed). Dense kernels and all
    biases are left untouched in f32.

    only: optional collection of conv names (e.g. {"mask0", "mask1"})
    — convs NOT listed keep their f32 kernels and run as exact convs
    (the int8 forward falls back per-leaf on missing `kernel_scale`),
    so callers can quantize just the MXU-bound convs where int8
    actually wins."""

    def quant(path, leaf):
        if not _is_conv_kernel(path, leaf):
            return {"": leaf}
        if only is not None and path[-2].key not in only:
            return {"": leaf}
        k = leaf.astype(jnp.float32)
        scale = jnp.max(jnp.abs(k), axis=(-4, -3, -2)) / 127.0
        scale = jnp.maximum(scale, 1e-12)  # all-zero channel guard
        kq = jnp.clip(jnp.round(k / scale[..., None, None, None, :]),
                      -127, 127).astype(jnp.int8)
        return {"": kq, "_scale": scale}

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = [p.key for p in path]
        node = out
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        for suffix, val in quant(path, leaf).items():
            node[keys[-1] + suffix] = val
    return out


def conv_q(qleaf_kernel: Array, scale: Array, bias: Array, x: Array,
           padding: str, compute_dtype, act_scale=None) -> Array:
    """s8 x s8 -> s32 conv; activation scale dynamic (None) or static
    (a scalar riding in the quantized param tree)."""
    xf = x.astype(jnp.float32)
    if act_scale is None:
        sa = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    else:
        sa = act_scale
    xq = jnp.clip(jnp.round(xf / sa), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, qleaf_kernel, (1, 1), padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sa * scale) + bias
    return y.astype(compute_dtype)


def conv_f32(kernel: Array, bias: Array, x: Array, padding: str,
             compute_dtype) -> Array:
    """Exact conv on raw params — the parity mode (tests only)."""
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype), (1, 1),
        padding, dimension_numbers=_DN)
    return y + bias.astype(compute_dtype)


def _make_conv(qp, mode: str, compute_dtype, record=None):
    if mode == "int8":
        def conv(name, x, padding):
            leaf = qp[name]
            if "kernel_scale" not in leaf:   # excluded by `only`
                return conv_f32(leaf["kernel"], leaf["bias"], x,
                                padding, compute_dtype)
            return conv_q(leaf["kernel"], leaf["kernel_scale"],
                          leaf["bias"], x, padding, compute_dtype,
                          act_scale=leaf.get("act_scale"))
    else:
        def conv(name, x, padding):
            if record is not None:   # calibration tap (eager only)
                record[name] = jnp.maximum(
                    record.get(name, jnp.float32(0.0)),
                    jnp.max(jnp.abs(x.astype(jnp.float32))))
            return conv_f32(qp[name]["kernel"], qp[name]["bias"], x,
                            padding, compute_dtype)
    return conv


def calibrate_act_scales(params, frames_u8, *, separate: bool = False,
                         compute_dtype=jnp.float32,
                         margin: float = 1.0) -> dict:
    """Run one f32 forward on a calibration batch and return static
    per-conv-input activation scales {subtree: {conv: float}} —
    `max|input| * margin / 127` per conv. The record taps mutate a
    dict at TRACE time, so the whole forward jits into one program
    (eager through a tunneled TPU would pay ~70 ms per primitive). A
    few hundred frames is plenty since the scales are per-tensor
    maxima, not histograms."""
    import jax

    def _run(p, u8):
        x = u8.astype(jnp.float32) * (1.0 / 255.0)
        cc = dict(mode="f32", compute_dtype=compute_dtype)
        rec = {"critic": {}, "masker": {}}
        _, em = critic_apply_q(p["critic"], x, record=rec["critic"],
                               **cc)
        if separate:
            rec["sepcrit"] = {}
            _, em = critic_apply_q(p["sepcrit"], x,
                                   record=rec["sepcrit"], **cc)
        masker_apply_q(p["masker"], x, em, record=rec["masker"], **cc)
        return rec

    recs = jax.jit(_run)(params, jnp.asarray(frames_u8))
    return {sub: {k: float(v) * margin / 127.0 for k, v in rec.items()}
            for sub, rec in recs.items()}


def merge_act_scales(qparams: dict, scales: dict) -> dict:
    """Attach calibrated activation scales to a `quantize_tree` output
    (in place; scalars ride the param tree so pipelines can swap
    params without retracing)."""
    for sub, d in scales.items():
        for name, s in d.items():
            if "kernel_scale" in qparams[sub][name]:  # quantized only
                qparams[sub][name]["act_scale"] = jnp.float32(s)
    return qparams


def critic_apply_q(qp, x: Array, *, mode: str = "int8",
                   compute_dtype=jnp.float32, record=None,
                   ) -> Tuple[Array, List[Array]]:
    """Deterministic-eval `Critic.__call__(collect=True)` mirror
    (models/critic.py:71-110; nets.py:160-212). qp: the critic
    subtree of `quantize_tree` output (or raw params, mode='f32').
    Returns (sigmoid pred (B, 1), 5-entry skip pyramid)."""
    conv = _make_conv(qp, mode, compute_dtype, record=record)
    x = x.astype(compute_dtype)
    embeds: List[Array] = []
    for i in range(4):
        x = nn.relu(conv(f"conv{i}", x, "SAME"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        embeds.append(x)  # post-pool, pre-dropout (nets.py:200-203)
    x = nn.relu(conv("conv_neck", x, "VALID"))
    embeds.append(x)
    # dense head stays f32-weights x compute_dtype activations — it is
    # a (neck, neck) + (neck, 1) matmul pair, negligible at any width
    h = x.reshape((x.shape[0], -1))
    h = nn.relu(h @ qp["fc0"]["kernel"].astype(compute_dtype)
                + qp["fc0"]["bias"].astype(compute_dtype))
    h = (h @ qp["fc1"]["kernel"].astype(compute_dtype)
         + qp["fc1"]["bias"].astype(compute_dtype))
    return nn.sigmoid(h.astype(jnp.float32)), embeds


def masker_apply_q(qp, x: Array, embeds: List[Array], *,
                   mode: str = "int8",
                   compute_dtype=jnp.float32, record=None) -> Array:
    """Deterministic `UnetDecoder.__call__` mirror
    (models/decoder.py:98-143; nets.py:452-523): no inter-conv
    activation (the reference's dead `self.acti` binding), x2 nearest
    upsamples, leaky-relu only inside the mask head."""
    from cgs_tpu.models.decoder import upsample2x as up2
    conv = _make_conv(qp, mode, compute_dtype, record=record)
    x = x.astype(compute_dtype)
    embeds = [e.astype(compute_dtype) for e in embeds]
    out4 = conv("dec4", embeds[4], "VALID")          # 1x1
    out3 = conv("dec3", jnp.concatenate(
        [embeds[3], up2(up2(out4))], axis=-1), "SAME")
    out2 = conv("dec2", jnp.concatenate(
        [embeds[2], up2(out3)], axis=-1), "SAME")
    out1 = conv("dec1", jnp.concatenate(
        [embeds[1], up2(out2)], axis=-1), "SAME")
    out0 = conv("dec0", jnp.concatenate(
        [embeds[0], up2(out1)], axis=-1), "SAME")
    h = conv("mask0", jnp.concatenate([x, up2(out0)], axis=-1), "SAME")
    h = nn.leaky_relu(h, negative_slope=0.01)
    h = conv("mask1", h, "SAME")
    return nn.sigmoid(h.astype(jnp.float32))
