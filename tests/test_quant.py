"""int8 inference quantization (ops/quant.py + MaskPipeline
quantize='int8').

Strategy: first pin the functional forward SKELETON against flax
apply exactly (mode='f32' runs the same wiring with exact convs on
the raw params — any mismatch is a wiring bug, not quantization
noise), then bound the int8 error (pred deviation, soft-mask
deviation, hard-mask agreement), then the pipeline-level guards and
wire composition. No reference analogue (the reference serves f32
torch, main.py:1130-1151) — this is the TPU serving extension."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.ops.quant import (critic_apply_q, masker_apply_q,
                               quantize_tree)
from cgs_tpu.pipeline import MaskPipeline


@pytest.fixture(scope="module")
def setup():
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    key = jax.random.PRNGKey(3)
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(11), (8, 64, 64, 3))
    return critic, masker, {"critic": cp, "masker": mp}, x


def test_quantize_tree_structure(setup):
    _, _, params, _ = setup
    q = quantize_tree(params)
    for name in ["conv0", "conv1", "conv2", "conv3", "conv_neck"]:
        leaf = q["critic"][name]
        assert leaf["kernel"].dtype == jnp.int8
        assert leaf["kernel"].shape == params["critic"][name]["kernel"].shape
        # per-output-channel scales
        assert leaf["kernel_scale"].shape == (
            params["critic"][name]["kernel"].shape[-1],)
        assert np.all(np.asarray(leaf["kernel_scale"]) > 0)
        np.testing.assert_array_equal(np.asarray(leaf["bias"]),
                                      np.asarray(params["critic"][name]["bias"]))
    # dense head left untouched in f32
    for name in ["fc0", "fc1"]:
        assert q["critic"][name]["kernel"].dtype == jnp.float32
        assert "kernel_scale" not in q["critic"][name]
    # quantization uses the full int8 range per channel
    kq = np.asarray(q["masker"]["mask0"]["kernel"])
    assert kq.max() == 127 or kq.min() == -127


def test_f32_mode_matches_flax_exactly(setup):
    """The functional skeleton (mode='f32') must reproduce flax apply
    bit-for-bit — pins the wiring before trusting int8 numbers."""
    critic, masker, params, x = setup
    pred_ref, em_ref = critic.apply({"params": params["critic"]}, x,
                                    collect=True)
    mask_ref = masker.apply({"params": params["masker"]}, x, em_ref)
    pred, em = critic_apply_q(params["critic"], x, mode="f32")
    mask = masker_apply_q(params["masker"], x, em, mode="f32")
    np.testing.assert_array_equal(np.asarray(pred_ref), np.asarray(pred))
    for a, b in zip(em_ref, em):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(mask_ref), np.asarray(mask))


def test_int8_close_to_f32(setup):
    critic, masker, params, x = setup
    pred_ref, em_ref = critic.apply({"params": params["critic"]}, x,
                                    collect=True)
    mask_ref = np.asarray(
        masker.apply({"params": params["masker"]}, x, em_ref))
    q = quantize_tree(params)
    pred, em = critic_apply_q(q["critic"], x, mode="int8")
    mask = np.asarray(masker_apply_q(q["masker"], x, em, mode="int8"))
    # sigmoid outputs: absolute deviation bounds (int8 roundoff
    # compounds through 5+7 convs; ~1e-3 observed, 1e-2 budgeted)
    assert np.max(np.abs(np.asarray(pred) - np.asarray(pred_ref))) < 1e-2
    assert np.max(np.abs(mask - mask_ref)) < 3e-2
    # hard masks at the -process threshold agree almost everywhere
    agree = np.mean((mask >= 0.5) == (mask_ref >= 0.5))
    assert agree > 0.995


def test_pipeline_int8_runs_and_matches(setup):
    critic, masker, params, _ = setup
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (19, 64, 64, 3), dtype=np.uint8)
    ref = MaskPipeline(critic, masker, params, batch_size=8)
    q8 = MaskPipeline(critic, masker, params, batch_size=8,
                      quantize="int8")
    a, b = ref.run(frames), q8.run(frames)
    assert b.masks.shape == a.masks.shape
    assert np.max(np.abs(a.masks - b.masks)) < 3e-2
    assert np.mean((a.masks >= 0.5) == (b.masks >= 0.5)) > 0.995


def test_pipeline_int8_wire_composes(setup):
    """quantize='int8' + wire='u8' + hard_threshold: the u8 wire is
    the floor-quantize of the INT8 path's own f32 mask (bit-identical
    to host-quantizing that mask), and the hard plane matches
    host-thresholding it."""
    critic, masker, params, _ = setup
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (9, 64, 64, 3), dtype=np.uint8)
    soft = MaskPipeline(critic, masker, params, batch_size=8,
                        quantize="int8")
    red = MaskPipeline(critic, masker, params, batch_size=8,
                       quantize="int8", wire="u8", hard_threshold=0.5)
    a, b = soft.run(frames), red.run(frames)
    np.testing.assert_array_equal(
        np.floor(np.clip(a.masks, 0, 1) * 255).astype(np.uint8),
        b.masks_u8)
    np.testing.assert_array_equal(
        (a.masks >= 0.5).astype(np.uint8), b.hard)


def test_pipeline_int8_ensemble(setup):
    """Ensemble + int8: the seed axis rides through quantize_tree's
    negative-axis reductions; outputs stay near the f32 ensemble."""
    critic, masker, params, _ = setup
    stacked = jax.tree.map(
        lambda a: jnp.stack([a, a * 1.02]), params)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    ref = MaskPipeline(critic, masker, stacked, batch_size=8,
                       ensemble=True)
    q8 = MaskPipeline(critic, masker, stacked, batch_size=8,
                      ensemble=True, quantize="int8")
    a, b = ref.run(frames), q8.run(frames)
    assert np.max(np.abs(a.masks - b.masks)) < 3e-2


def test_pipeline_int8_static_scales(setup):
    """calib=frames bakes static activation scales; accuracy holds on
    in-distribution data (scales are maxima from the same family)."""
    critic, masker, params, _ = setup
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (12, 64, 64, 3), dtype=np.uint8)
    calib = rng.integers(0, 256, (32, 64, 64, 3), dtype=np.uint8)
    ref = MaskPipeline(critic, masker, params, batch_size=8)
    qs = MaskPipeline(critic, masker, params, batch_size=8,
                      quantize="int8", calib=calib)
    a, b = ref.run(frames), qs.run(frames)
    assert np.max(np.abs(a.masks - b.masks)) < 3e-2
    assert np.mean((a.masks >= 0.5) == (b.masks >= 0.5)) > 0.995
    # the quantized tree carries the baked scalars
    assert "act_scale" in qs.params["masker"]["mask0"]


def test_quantize_tree_only_subset(setup):
    """`only` quantizes a subset; the int8 forward falls back to the
    exact f32 conv per unquantized leaf — with an empty subset the
    int8 path IS the f32 skeleton (bit-identical to flax)."""
    critic, masker, params, x = setup
    q = quantize_tree(params, only={"mask0", "mask1"})
    assert q["masker"]["mask0"]["kernel"].dtype == jnp.int8
    assert q["masker"]["dec0"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in q["masker"]["dec0"]
    q0 = quantize_tree(params, only=set())
    pred_ref, em_ref = critic.apply({"params": params["critic"]}, x,
                                    collect=True)
    mask_ref = masker.apply({"params": params["masker"]}, x, em_ref)
    pred, em = critic_apply_q(q0["critic"], x, mode="int8")
    mask = masker_apply_q(q0["masker"], x, em, mode="int8")
    np.testing.assert_array_equal(np.asarray(pred_ref), np.asarray(pred))
    np.testing.assert_array_equal(np.asarray(mask_ref), np.asarray(mask))


def test_pipeline_int8_guards(setup):
    critic, masker, params, _ = setup
    with pytest.raises(ValueError, match="saliency"):
        MaskPipeline(critic, masker, params, salience=True,
                     quantize="int8")
    with pytest.raises(ValueError, match="eval_mode"):
        MaskPipeline(critic, masker, params, eval_mode=False,
                     quantize="int8")
    with pytest.raises(ValueError, match="quantize"):
        MaskPipeline(critic, masker, params, quantize="fp8")


def test_int8_chfak5_width(setup):
    """The published width (chfak=5) — the serving target the 1.52x
    probe was measured at — runs and stays accurate."""
    critic, masker = Critic(chfak=5, dropout=0.0), UnetDecoder(chfak=5)
    key = jax.random.PRNGKey(9)
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    params = {"critic": cp, "masker": mp}
    x = jax.random.uniform(jax.random.PRNGKey(13), (4, 64, 64, 3))
    pred_ref, em_ref = critic.apply({"params": cp}, x, collect=True)
    mask_ref = np.asarray(masker.apply({"params": mp}, x, em_ref))
    q = quantize_tree(params)
    pred, em = critic_apply_q(q["critic"], x, mode="int8")
    mask = np.asarray(masker_apply_q(q["masker"], x, em, mode="int8"))
    assert np.max(np.abs(np.asarray(pred) - np.asarray(pred_ref))) < 1e-2
    assert np.mean((mask >= 0.5) == (mask_ref >= 0.5)) > 0.995
