"""sandbox/ablation.py: paired 4-variant sweep driver.

The training itself is seed_parallel (covered by
test_seed_parallel.py, incl. seeded-vs-serial parity for the ablation
variants); here we pin the DRIVER contract: flag injection, model
suffixing, shared --runs, the paired-delta summary math, and the
guard rails."""

import numpy as np
import pytest

from cgs_tpu.sandbox import ablation


def _fake_seed_parallel(calls, ious_by_variant):
    def fake_main(argv):
        calls.append(list(argv))
        # identify the variant by its flag (full = none present)
        present = [v for v, fs in ablation.VARIANT_FLAGS.items()
                   if fs and set(fs) <= set(argv)]
        variant = present[0] if present else "full"
        return {"ious": ious_by_variant[variant]}
    return fake_main


IOUS = {
    "full": [0.6, 0.7, 0.5],
    "noinject": [0.5, 0.6, 0.45],
    "frozen": [0.7, 0.8, 0.6],
    "separate": [0.4, 0.5, 0.3],
}


def test_run_ablation_paired_flow(monkeypatch, tmp_path):
    calls = []
    from cgs_tpu.sandbox import seed_parallel
    monkeypatch.setattr(seed_parallel, "main",
                        _fake_seed_parallel(calls, IOUS))
    results_path = str(tmp_path / "results.txt")
    out = ablation.run_ablation(
        ["-synthetic_data", "--model", "abl"], runs=3,
        results_path=results_path)

    # one call per variant, each with the suffixed model, the shared
    # --runs, and exactly its own flag
    assert len(calls) == 4
    for argv, variant in zip(calls, ablation.VARIANT_FLAGS):
        assert argv[argv.index("--model") + 1] == f"abl-{variant}"
        assert argv[argv.index("--runs") + 1] == "3"
        for other, flags in ablation.VARIANT_FLAGS.items():
            for f in flags:
                assert (f in argv) == (other == variant)

    summary = open(results_path).read()
    # paired deltas vs full: frozen +0.1 (3/3 above), separate -0.2
    assert "frozen" in summary and "+0.100" in summary
    assert "3/3 above full" in summary
    assert "-0.200" in summary
    assert out["full"]["ious"] == IOUS["full"]


def test_slow_critic_fifth_variant(monkeypatch, tmp_path):
    """--slow-critic S adds a paired 'slow' cell: full's flags plus
    --critic-lr-scale S, suffixed model, included in the summary."""
    calls = []
    from cgs_tpu.sandbox import seed_parallel

    def fake_main(argv):
        calls.append(list(argv))
        if "--critic-lr-scale" in argv:
            return {"ious": [0.65, 0.72, 0.6]}
        present = [v for v, fs in ablation.VARIANT_FLAGS.items()
                   if fs and set(fs) <= set(argv)]
        return {"ious": IOUS[present[0] if present else "full"]}

    monkeypatch.setattr(seed_parallel, "main", fake_main)
    results_path = str(tmp_path / "results.txt")
    out = ablation.main(["--runs", "3", "-synthetic_data",
                         "--model", "abl", "--slow-critic", "0.1"])
    assert len(calls) == 5
    slow_call = calls[-1]
    assert slow_call[slow_call.index("--model") + 1] == "abl-slow"
    i = slow_call.index("--critic-lr-scale")
    assert slow_call[i + 1] == "0.1"
    # no ablation flag leaks into the slow cell (it is full + knob)
    for flags in ablation.VARIANT_FLAGS.values():
        for f in flags:
            assert f not in slow_call
    assert out["slow"]["ious"] == [0.65, 0.72, 0.6]
    assert "slow" in ablation.paired_summary(out)


def test_base_seed_passes_through(monkeypatch):
    """--base-seed rides the per-variant argv into seed_parallel (which
    pops it before parse_args) — the second decade of a 20-seed table
    needs no ad-hoc script."""
    calls = []
    from cgs_tpu.sandbox import seed_parallel
    monkeypatch.setattr(seed_parallel, "main",
                        _fake_seed_parallel(calls, IOUS))
    ablation.run_ablation(
        ["-synthetic_data", "--model", "abl", "--base-seed", "10"],
        runs=3, results_path=None)
    for argv in calls:
        assert argv[argv.index("--base-seed") + 1] == "10"


def test_paired_summary_math():
    res = {v: {"ious": IOUS[v]} for v in IOUS}
    s = ablation.paired_summary(res)
    full = np.array(IOUS["full"])
    d = np.array(IOUS["noinject"]) - full
    sem = d.std(ddof=1) / np.sqrt(3)
    assert f"{d.mean():+.3f} +- {sem:.3f}sem" in s
    assert "0/3 above full" in s
    # per-variant spread uses the SAME ddof=1 convention as the sem
    # (ADVICE r4)
    std = full.std(ddof=1)
    assert f"full      mean {full.mean():.3f} +- {std:.3f}" in s


def test_paired_summary_rejects_unequal_lengths():
    """A missing/short per-variant IoU list must fail loudly BEFORE the
    deltas misbroadcast (ADVICE r4)."""
    res = {v: {"ious": IOUS[v]} for v in IOUS}
    res["frozen"] = {"ious": IOUS["frozen"][:2]}
    with pytest.raises(ValueError, match="frozen"):
        ablation.paired_summary(res)
    res["frozen"] = {}
    with pytest.raises(ValueError, match="frozen"):
        ablation.paired_summary(res)


def test_model_eq_form_suffixed():
    argv = ablation._with_variant(["--model=abl"], "frozen")
    assert "--model=abl-frozen" in argv and "-frozen" in argv


def test_missing_model_gets_default():
    argv = ablation._with_variant(["-synthetic_data"], "separate")
    assert argv[argv.index("--model") + 1] == "ablation-separate"


def test_rejects_preset_variant_flags():
    with pytest.raises(SystemExit):
        ablation.run_ablation(["-frozen", "--model", "x"], runs=2)


def test_requires_full_baseline():
    with pytest.raises(SystemExit):
        ablation.run_ablation(["--model", "x"], runs=2,
                              variants=("frozen", "separate"))
