"""Aux subsystems (SURVEY.md §5): orbax full-state checkpointing +
resume, profiler plumbing, NaN guards, metrics writer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.models.critic import Critic
from cgs_tpu.train.checkpoints import OrbaxManager
from cgs_tpu.train.steps import init_train_state, make_optimizer
from cgs_tpu.utils.metrics import MetricsWriter
from cgs_tpu.utils.profiling import Profiler, nan_guard

KEY = jax.random.PRNGKey(0)


def _state():
    critic = Critic(dropout=0.0)
    cp = critic.init({"params": KEY}, jnp.zeros((2, 64, 64, 3)),
                     collect=True)["params"]
    tx = make_optimizer()
    return init_train_state({"critic": cp}, tx)


def test_orbax_save_restore_roundtrip(tmp_path):
    state = _state()
    mgr = OrbaxManager(str(tmp_path / "ckpt"))
    mgr.save(3, state)
    mgr.wait()
    assert mgr.latest_step() == 3

    template = _state()
    step, restored, _ = mgr.restore(template)
    assert step == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    # optimizer state restored too (the reference never saves it)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        state.opt_state, restored.opt_state)


def test_orbax_latest_wins(tmp_path):
    state = _state()
    mgr = OrbaxManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.save(2, state)
    mgr.wait()
    assert mgr.latest_step() == 2


def test_orbax_restore_empty_returns_none(tmp_path):
    mgr = OrbaxManager(str(tmp_path / "empty"))
    assert mgr.restore(_state()) is None


def test_nan_guard_detects():
    good = {"a": jnp.ones(4), "b": jnp.zeros((2, 2))}
    nan_guard(good, "ok/")  # no raise
    bad = {"a": jnp.asarray([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError, match="bad/"):
        nan_guard(bad, "bad/")
    inf = {"x": jnp.asarray([jnp.inf])}
    with pytest.raises(FloatingPointError):
        nan_guard(inf)
    ints = {"i": jnp.asarray([1, 2, 3])}  # non-float leaves skipped
    nan_guard(ints)


def test_profiler_annotation_noop_without_trace():
    prof = Profiler(None)
    with prof.annotate("region"):
        x = jnp.sum(jnp.ones(8))
    assert float(x) == 8.0
    prof.start()   # no trace_dir -> no-op
    prof.stop()


def test_profiler_trace_writes_xplane(tmp_path):
    prof = Profiler(str(tmp_path / "trace"))
    with prof.trace():
        with prof.annotate("work"):
            jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64)))\
                .block_until_ready()
    files = [os.path.join(dp, f)
             for dp, _, fs in os.walk(tmp_path / "trace") for f in fs]
    assert files, "no trace artifacts written"


def test_metrics_writer(tmp_path):
    m = MetricsWriter(str(tmp_path))
    m.write("loss", step=5, loss=0.25, tag="x")
    m.write("eval", iou=0.4)
    m.close()
    lines = [json.loads(ln) for ln in
             open(tmp_path / "metrics.jsonl")]
    assert lines[0]["kind"] == "loss" and lines[0]["step"] == 5
    assert lines[0]["loss"] == 0.25
    assert lines[1]["iou"] == 0.4


def test_tb_export_round_trip(tmp_path):
    """metrics.jsonl -> TensorBoard event files (the 'optional
    TensorBoard' half of SURVEY §5's metrics row): scalars land under
    kind/field tags at the logged steps and read back via the event
    accumulator."""
    pytest.importorskip("torch.utils.tensorboard")
    from cgs_tpu.utils.tb_export import export_run

    m = MetricsWriter(str(tmp_path))
    for s in range(3):
        m.write("critic_loss", step=s * 100, loss=0.5 - 0.1 * s)
    m.write("eval", iou=0.42, note="text-skipped")
    m.close()
    out = export_run(str(tmp_path))
    files = os.listdir(out)
    assert any("tfevents" in f for f in files), files

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    acc = EventAccumulator(out)
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "critic_loss/loss" in tags and "eval/iou" in tags
    events = acc.Scalars("critic_loss/loss")
    assert [e.step for e in events] == [0, 100, 200]
    np.testing.assert_allclose([e.value for e in events],
                               [0.5, 0.4, 0.3], rtol=1e-6)
    assert "eval/note" not in tags  # non-numeric fields skipped


def test_multihost_pod_autodetect(monkeypatch):
    """TPU_WORKER_HOSTNAMES with multiple workers (standard Cloud-TPU
    pod launch, no JAX_* vars) must trigger the no-arg
    jax.distributed.initialize auto-detection."""
    import jax
    from cgs_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    multihost.ensure_initialized()
    assert calls == [((), {})]

    # lone hostname -> stays local, backend untouched
    calls.clear()
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0")
    assert multihost.ensure_initialized() is False
    assert not calls


def test_saliency_eps_no_nan_on_dead_gradients():
    """float32-representable eps: all-zero saliency (ReLU-dead input
    grads) must normalize to zeros, not NaN (the reference's
    sys.float_info.min underflows to 0 in float32)."""
    import numpy as np
    from cgs_tpu.ops.saliency import (
        normalize_saliency_global, normalize_saliency_topk)

    sal = np.zeros((2, 8, 8, 1), np.float32)
    preds = np.asarray([0.5, 0.9], np.float32)
    for fn in (normalize_saliency_global, normalize_saliency_topk):
        soft, hard = fn(sal, preds, 1.5)
        assert np.isfinite(np.asarray(soft)).all(), fn.__name__
        assert np.asarray(hard).sum() == 0


def test_pipeline_empty_input_returns_empty_output():
    import numpy as np
    import jax
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    from cgs_tpu.pipeline import MaskPipeline

    key = jax.random.PRNGKey(0)
    x0 = np.zeros((1, 64, 64, 3), np.float32)
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    pipe = MaskPipeline(critic, masker,
                        {"critic": cp, "masker": mp}, batch_size=8)
    out = pipe.run(np.zeros((0, 64, 64, 3), np.uint8))
    assert out.preds.shape == (0,) and out.masks.shape == (0, 64, 64, 1)


@pytest.mark.slow  # profiled two-phase training run (~2.3 min, 1 CPU)
def test_profile_trace_spans_both_phases(tmp_path, monkeypatch):
    """--profile through the CLI produces an xplane trace even when
    the critic phase short-circuits via cload (the round-2 review
    found only the critic phase was ever traced)."""
    monkeypatch.chdir(tmp_path)
    from cgs_tpu.cli import main

    trace_dir = tmp_path / "trace"
    main(["-train", "-synthetic_data", "--datasize", "400",
          "--testsize", "50", "--cepochs", "2", "--mepochs", "1",
          "--visevery", "10", "--dropout", "0", "--shift", "0",
          "--contrastive-min", "5", "--model", "profrun",
          # loose split thresholds: 2 epochs won't separate 0.7/0.3
          "--high-rew-thresh", "0.4", "--low-rew-thresh", "0.6",
          "--profile", str(trace_dir)])
    dumped = list(trace_dir.rglob("*.xplane.pb"))
    assert dumped, "no xplane trace written"


def test_moving_average_matches_reference_formula():
    """main.py:26-28 get_moving_avg golden values (incl. the len-n
    output-length quirk: len(x)-n points, NOT len(x)-n+1)."""
    import numpy as np

    from cgs_tpu.utils.artifacts import moving_average

    x = np.arange(25, dtype=np.float64) ** 1.5
    cumsum = np.cumsum(x)
    want = (cumsum[10:] - cumsum[:-10]) / 10
    np.testing.assert_allclose(moving_average(x, 10), want)
    assert len(moving_average(x, 10)) == 15
    np.testing.assert_allclose(moving_average([1.0] * 5, 3),
                               [1.0, 1.0])
