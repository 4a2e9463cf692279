"""End-to-end pipeline test on the synthetic fixture (SURVEY.md §4
item 3): both training phases + eval + process run through the real
CLI dispatch in <~3 min on the CPU mesh, producing the reference's
artifact layout. Mask *quality* is asserted separately in the TPU
acceptance run (tiny step budgets here)."""

import os

import numpy as np
import pytest
from PIL import Image

from cgs_tpu.cli import main

pytestmark = pytest.mark.slow  # full two-phase synthetic training e2e (~10 min on the 1-CPU box)

ARGS = ["-synthetic_data", "--datasize", "2000", "--testsize", "200",
        "--cepochs", "8", "--visevery", "40", "--dropout", "0",
        "--shift", "0", "--contrastive-min", "100",
        "--model", "e2erun"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


@pytest.fixture(scope="module")
def trained(workdir):
    return main(["-train", "-eval"] + ARGS)


def test_training_artifacts(trained, workdir):
    run = workdir / "e2erun"
    assert (run / "saves").exists()
    pts = list((run / "saves").glob("critic-*.pt"))
    assert pts, "critic checkpoint missing"
    assert list((run / "saves").glob("masker-*.pt"))
    assert (run / "critic" / "_loss.png").exists()
    assert (run / "critic" / "log.txt").exists()
    assert (run / "segment" / "_loss.png").exists()
    assert list(run.glob("pred_idx1_hist.png"))
    assert list(run.glob("*>0.7__*<0.3.txt"))  # count marker
    assert (run / "metrics.jsonl").read_text().strip()


def test_contrastive_split_was_learned(trained):
    sets = trained.contrastive
    assert sets.n_pos >= 100 and sets.n_neg >= 100
    # the critic separated high/low frames (preds span the range)
    assert sets.preds.max() > 0.7 and sets.preds.min() < 0.3


def test_eval_outputs(trained, workdir):
    # Handler.ious is the best-so-far tracker (main.py:77)
    assert 0.0 <= trained.ious[0] <= 1.0
    videos = list((workdir / "eval-results" / "e2erun").glob("*.mp4"))
    assert videos, "best-eval comparison video missing"


def test_checkpoint_reload_and_process(trained, workdir):
    """Second invocation must load the saved .pt checkpoints (cload/
    mload) and run -process with reference-named outputs."""
    from cgs_tpu.data.synthetic import synthetic_eval_set
    src = workdir / "srcimgs"
    src.mkdir(exist_ok=True)
    x, _ = synthetic_eval_set(6, seed=5)
    for i in range(6):
        Image.fromarray(x[i]).save(src / f"img{i}.png")

    main(["-process", "-concatenated", "--source-imgs", str(src),
          "--mask-output-imgs", str(workdir / "out")] + ARGS)
    outs = sorted(os.listdir(workdir / "out"))
    assert outs == [f"img{i}_with_mask.png" for i in range(6)]

    # per-variant naming without -concatenated (main.py:1220-1223)
    main(["-process", "--source-imgs", str(src),
          "--mask-output-imgs", str(workdir / "out2")] + ARGS)
    outs2 = os.listdir(workdir / "out2")
    assert any(o.endswith("-raw-mask.png") for o in outs2)
    assert any(o.endswith("-thresholded-mask.png") for o in outs2)


def test_paper_video_test_mode(trained, workdir):
    """`-test` is the paper-video reproduction path (main.py:1540-1545,
    SURVEY.md §3.4): with default cload/mload it loads the saved
    checkpoints (no retrain), forces eval+salience+visbesteval with CRF
    off, and writes the best-IoU comparison video into --output-video."""
    vids = workdir / "papervids"
    h = main(["-test", "--output-video", str(vids)] + ARGS)
    assert h.cfg.eval and h.cfg.salience and h.cfg.visbesteval
    assert h.cfg.train is False and h.cfg.crf is False
    # h.ious stays [0]: the reference's best-tracker update is
    # commented out (main.py:1018) and we reproduce that, so every
    # -test invocation re-renders the video. The achieved IoU is in
    # the video filename.
    assert h.ious == (0.0, 0.0)
    out = list(vids.glob("iou=*.mp4"))
    assert out, "paper comparison video missing"
    assert out[0].stat().st_size > 0
    assert float(out[0].stem.split("=")[1]) > 0.0


def test_pt_checkpoint_is_torch_loadable(trained, workdir):
    """The saved checkpoints must be plain torch state_dicts in the
    reference layout — exchangeable with the upstream."""
    import torch
    pt = next((workdir / "e2erun" / "saves").glob("critic-*.pt"))
    state = torch.load(str(pt), weights_only=True)
    assert state["features.0.weight"].shape == (8, 3, 3, 3)
    assert state["crit.4.weight"].shape == (1, 32)


def test_eval_reports_last_ious(trained):
    """handler.last_ious carries the actual eval scores; the
    reference-parity tracker handler.ious stays un-updated by eval()
    (main.py:1018) — sandbox.multirun aggregates from last_ious."""
    assert trained.last_ious and 0.0 <= trained.last_ious[0] <= 1.0
