"""Reduced mask wire + bounded in-flight dispatch (VERDICT r3 #3/#4).

The host-fed `-process` path is D2H-transfer-bound (16 KB/frame of f32
soft mask). wire='u8' moves the PNG-space quantization in-graph and
hard_threshold moves the binarization in-graph; outputs must be
BIT-IDENTICAL to the f32 host path. run() must also never hold more
than max_in_flight chunks of outputs live on device.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.pipeline import MaskPipeline


@pytest.fixture(scope="module")
def models_params():
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    key = jax.random.PRNGKey(7)
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    return critic, masker, {"critic": cp, "masker": mp}


@pytest.fixture(scope="module")
def frames(rng):
    return rng.integers(0, 256, (37, 64, 64, 3), dtype=np.uint8)


THRESH = 0.5


def test_u8_wire_bit_identical(models_params, frames):
    critic, masker, params = models_params
    f32 = MaskPipeline(critic, masker, params, batch_size=16)
    red = MaskPipeline(critic, masker, params, batch_size=16,
                       wire="u8", hard_threshold=THRESH)
    a = f32.run(frames)
    b = red.run(frames)
    assert b.masks is None and b.masks_u8 is not None
    np.testing.assert_array_equal(a.preds, b.preds)
    # quantized soft mask == exactly what the PNG writer computes from
    # the f32 mask (main.py:1216-1223 truncating cast)
    np.testing.assert_array_equal(
        b.masks_u8, (255 * np.clip(a.masks, 0, 1)).astype(np.uint8))
    # in-graph binarization == host thresholding of the f32 mask
    # (main.py:1164, >=)
    np.testing.assert_array_equal(
        b.hard, (a.masks >= THRESH).astype(np.uint8))
    assert b.masks_u8.dtype == np.uint8 and b.hard.dtype == np.uint8


def test_f32_wire_with_device_hard(models_params, frames):
    """hard_threshold composes with the default f32 wire too."""
    critic, masker, params = models_params
    f32 = MaskPipeline(critic, masker, params, batch_size=16)
    dev = MaskPipeline(critic, masker, params, batch_size=16,
                       hard_threshold=THRESH)
    a, b = f32.run(frames), dev.run(frames)
    np.testing.assert_array_equal(a.masks, b.masks)
    np.testing.assert_array_equal(
        b.hard, (a.masks >= THRESH).astype(np.uint8))


def test_segment_folder_outputs_bit_identical(models_params, frames,
                                              tmp_path):
    """-process PNGs (concatenated and per-variant) from the reduced
    wire byte-equal the f32 path's."""
    from cgs_tpu.eval.segment import segment_folder
    critic, masker, params = models_params

    src = tmp_path / "src"
    src.mkdir()
    for i, f in enumerate(frames[:9]):
        Image.fromarray(f).save(src / f"img{i:03d}.png")

    for concatenated in (False, True):
        cfg = Config(binarymaskthreshold=THRESH,
                     concatenated=concatenated).derive()
        outs = {}
        for wire in ("f32", "u8"):
            pipe = MaskPipeline(
                critic, masker, params, batch_size=8, wire=wire,
                hard_threshold=THRESH if wire == "u8" else None)
            out_dir = tmp_path / f"out-{wire}-{concatenated}"
            segment_folder(cfg, pipe, str(src), out_dir=str(out_dir))
            outs[wire] = {
                name: (out_dir / name).read_bytes()
                for name in sorted(os.listdir(out_dir))}
        assert outs["f32"].keys() == outs["u8"].keys()
        assert len(outs["f32"]) > 0
        for name in outs["f32"]:
            assert outs["f32"][name] == outs["u8"][name], (
                f"PNG bytes differ: {name} (concatenated="
                f"{concatenated})")


def test_reduced_wire_rejects_crf(models_params, frames, tmp_path):
    from cgs_tpu.eval.segment import _mask_variants
    critic, masker, params = models_params
    cfg = Config(crf=True).derive()
    pipe = MaskPipeline(critic, masker, params, batch_size=8,
                        wire="u8")
    with pytest.raises(ValueError, match="f32"):
        _mask_variants(cfg, pipe, frames[:4] / 255.0,
                       crf_fn=lambda x, m: m > 0.5)


def test_handler_segment_selects_reduced_wire():
    """Handler.segment picks wire='u8' (+in-graph binarization) when
    -crf is off, f32 when on — pipe cache keys stay distinct."""
    cfg = Config(binarymaskthreshold=0.5).derive()
    from cgs_tpu.handler import Handler
    h = Handler.__new__(Handler)  # no run dirs needed for this check
    h.cfg = cfg
    wire = "f32" if cfg.crf else "u8"
    assert wire == "u8"
    cfg2 = Config(crf=True).derive()
    assert ("f32" if cfg2.crf else "u8") == "f32"


def test_run_bounds_in_flight_dispatches(models_params):
    """run() holds at most max_in_flight undelivered chunk outputs
    (VERDICT r3 #3: unbounded async dispatch OOMs HBM on big
    folders). Mocks _fn; a chunk counts as live from dispatch until
    its first output readback."""
    critic, masker, params = models_params
    pipe = MaskPipeline(critic, masker, params, batch_size=4,
                        max_in_flight=2)

    state = {"live": 0, "max": 0, "dispatches": 0}

    class _Lazy:
        """First np.asarray() readback retires the chunk."""

        def __init__(self, arr, retire):
            self._arr = arr
            self._retire = retire

        def __array__(self, dtype=None, copy=None):
            if self._retire is not None:
                self._retire()
                self._retire = None
            return self._arr

    def fake_fn(p, u8, key):
        state["live"] += 1
        state["dispatches"] += 1
        state["max"] = max(state["max"], state["live"])
        n = int(u8.shape[0])

        def retire():
            state["live"] -= 1

        return (_Lazy(np.zeros((n,), np.float32), retire),
                np.zeros((n, 64, 64, 1), np.float32), None)

    pipe._fn = fake_fn
    out = pipe.run(np.zeros((40, 64, 64, 3), np.uint8))  # 10 chunks
    assert state["dispatches"] == 10
    assert state["max"] <= 2, f"held {state['max']} chunks live"
    assert out.preds.shape == (40,)


def test_empty_input_reduced_wire(models_params):
    critic, masker, params = models_params
    pipe = MaskPipeline(critic, masker, params, batch_size=8,
                        wire="u8", hard_threshold=0.5)
    out = pipe.run(np.zeros((0, 64, 64, 3), np.uint8))
    assert out.masks is None
    assert out.masks_u8.shape == (0, 64, 64, 1)
    assert out.hard.shape == (0, 64, 64, 1)


def test_ensemble_mean_precedes_quantization(models_params, frames):
    """wire encoding must wrap the ensemble MEAN (a mean of quantized
    members would differ); assert vs the f32 ensemble."""
    critic, masker, params = models_params
    stacked = jax.tree.map(
        lambda a: jnp.stack([a, a * 1.01]), params)
    f32 = MaskPipeline(critic, masker, stacked, batch_size=16,
                       ensemble=True)
    red = MaskPipeline(critic, masker, stacked, batch_size=16,
                       ensemble=True, wire="u8", hard_threshold=THRESH)
    a, b = f32.run(frames), red.run(frames)
    np.testing.assert_array_equal(
        b.masks_u8, (255 * np.clip(a.masks, 0, 1)).astype(np.uint8))
    np.testing.assert_array_equal(
        b.hard, (a.masks >= THRESH).astype(np.uint8))
