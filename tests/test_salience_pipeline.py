"""The fused saliency path in MaskPipeline (value_and_grad of the
critic over its input, main.py:949-953) — e2e over the -test flag's
implied configuration."""

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.ops.saliency import normalize_saliency_global
from cgs_tpu.pipeline import MaskPipeline

KEY = jax.random.PRNGKey(0)


def _models():
    critic = Critic(dropout=0.0)
    masker = UnetDecoder()
    x0 = jnp.zeros((2, 64, 64, 3))
    cp = critic.init({"params": KEY}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": KEY}, x0, em)["params"]
    return critic, masker, {"critic": cp, "masker": mp}


def test_pipeline_salience_output(rng):
    critic, masker, params = _models()
    pipe = MaskPipeline(critic, masker, params, batch_size=32,
                        salience=True)
    frames = rng.integers(0, 256, (50, 64, 64, 3), dtype=np.uint8)
    out = pipe.run(frames)
    assert out.saliency is not None
    assert out.saliency.shape == (50, 64, 64, 1)
    assert (out.saliency >= 0).all()          # |grad|
    assert np.isfinite(out.saliency).all()
    # ragged tail: 50 frames through batch 32 must return exactly 50
    assert out.preds.shape == (50,) and out.masks.shape[0] == 50

    # full -test normalization chain produces a binary baseline mask
    cfg = Config(test=True).derive()
    soft, hard = normalize_saliency_global(
        jnp.asarray(out.saliency), jnp.asarray(out.preds),
        cfg.salience_thresh)
    assert set(np.unique(np.asarray(hard))) <= {0, 1}


def test_pipeline_salience_matches_manual_grad(rng):
    """Pipeline saliency == jax.grad of mean pred wrt input."""
    critic, masker, params = _models()
    pipe = MaskPipeline(critic, masker, params, batch_size=8,
                        salience=True)
    frames = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    out = pipe.run(frames)

    x = jnp.asarray(frames).astype(jnp.float32) / 255.0

    def mean_pred(xx):
        return jnp.mean(critic.apply({"params": params["critic"]}, xx))

    g = jax.grad(mean_pred)(x)
    manual = np.asarray(jnp.sum(jnp.abs(g), axis=-1, keepdims=True))
    np.testing.assert_allclose(out.saliency, manual, atol=1e-6)


def test_pipeline_separate_uses_sepcrit_embeds(rng):
    """-separate: masker features come from sepcrit (main.py:946-947),
    so masks must differ from the shared-encoder path."""
    critic, masker, params = _models()
    sep = critic.init({"params": jax.random.PRNGKey(9)},
                      jnp.zeros((2, 64, 64, 3)),
                      collect=True)["params"]
    params2 = dict(params, sepcrit=sep)
    frames = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    shared = MaskPipeline(critic, masker, params, batch_size=8).run(
        frames)
    separate = MaskPipeline(critic, masker, params2, batch_size=8,
                            separate=True).run(frames)
    # critic preds identical, masks different
    np.testing.assert_allclose(shared.preds, separate.preds, atol=1e-6)
    assert not np.allclose(shared.masks, separate.masks)
