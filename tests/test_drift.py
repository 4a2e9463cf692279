"""sandbox.drift — the critic-drift probe (RESULTS.md "The collapse
mechanism, measured").

One tiny two-phase train per variant on the easy synthetic fixture;
asserts the probe's invariants rather than fixture-dependent values:
frozen must read EXACTLY zero on every drift axis (its critic never
updates), full must drift, and the two variants must share the
phase-1 critic bit-for-bit (same seed, variant flags only touch the
masker phase — the pairing guarantee the RESULTS.md traces rely on).
"""

import numpy as np
import pytest

from cgs_tpu.data.synthetic import synthetic_eval_set
from cgs_tpu.sandbox import drift

pytestmark = pytest.mark.slow  # two two-phase trainings (~5 min)

ARGS = ["-synthetic_data", "--datasize", "1500", "--testsize", "200",
        "--cepochs", "6", "--mepochs", "1", "--visevery", "40",
        "--dropout", "0", "--shift", "0", "--contrastive-min", "50",
        "--model", "drifttest"]


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    import os
    wd = tmp_path_factory.mktemp("drift")
    old = os.getcwd()
    os.chdir(wd)
    try:
        yield drift.main(ARGS + ["--variants", "full,frozen"])
    finally:
        os.chdir(old)


def test_row_schema(results):
    for variant in ("full", "frozen"):
        rows = results[variant]
        assert len(rows) == 2          # epoch 0 baseline + 1 epoch
        for key in ("iou", "test_mse", "separation", "param_drift",
                    "embeds_drift"):
            assert key in rows[0]
        assert len(rows[0]["embeds_drift"]) == 5   # skip pyramid
        assert "live_critic_loss" in rows[1]       # post-epoch only


def test_frozen_reads_exactly_zero_drift(results):
    row = results["frozen"][-1]
    assert row["param_drift"] == 0.0
    assert all(d == 0.0 for d in row["embeds_drift"])
    assert row["live_critic_loss"] == 0.0          # no critic term
    base = results["frozen"][0]
    assert row["test_mse"] == base["test_mse"]
    assert row["separation"] == base["separation"]


def test_full_drifts(results):
    row = results["full"][-1]
    assert row["param_drift"] > 0.0
    assert any(d > 0.0 for d in row["embeds_drift"])
    assert row["live_critic_loss"] > 0.0


def test_variants_share_phase1_critic(results):
    a, b = results["full"][0], results["frozen"][0]
    assert a["test_mse"] == b["test_mse"]
    assert a["separation"] == b["separation"]
    assert a["iou"] == b["iou"]
    assert a["param_drift"] == b["param_drift"] == 0.0


def test_requires_synthetic_data():
    with pytest.raises(SystemExit, match="synthetic"):
        drift.main(["--datasize", "100", "--model", "x"])


def test_rejects_unknown_variant():
    with pytest.raises(SystemExit, match="unknown variants"):
        drift.main(ARGS + ["--variants", "full,bogus"])
