"""Visualize / eval-mode coverage: curve videos, purevis, eval over a
folder, -test flag implications."""

import os

import numpy as np
import pytest
from PIL import Image

from cgs_tpu.core.config import Config, parse_args
from cgs_tpu.handler import Handler


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vis")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


@pytest.fixture(scope="module")
def handler(workdir):
    cfg = Config(synthetic_data=True, datasize=600, testsize=100,
                 model="visrun", vismasker=True).derive()
    h = Handler(cfg)
    h.load_data()
    return h


def test_visualize_writes_three_videos(handler, workdir):
    paths = handler.visualize()
    # curves, pred-sorted, GT-sorted (sortidx=1 default, main.py:879-884)
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
    assert paths[0].endswith("curves.mp4")
    assert paths[1].endswith("curves-pred-sorted.mp4")
    assert paths[2].endswith("curves-GT-sorted.mp4")


def test_purevis_skips_model(handler, workdir):
    handler.cfg.purevis = "0,1"
    try:
        paths = handler.visualize()
        assert all(os.path.exists(p) for p in paths)
    finally:
        handler.cfg.purevis = ""


def test_eval_folder_mode(handler, workdir):
    src = workdir / "evalimgs"
    src.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                     dtype=np.uint8)).save(
            src / f"f{i}.png")
    handler.cfg.visbesteval = False  # zero-GT -> IoU 0, no video
    ious = handler.eval(folder=str(src))
    assert len(ious) == 1 and ious[0] == 0.0  # all-zero GT


def test_test_flag_implications():
    cfg = parse_args(["-test"])
    # main.py:1540-1545
    assert cfg.eval and cfg.salience and cfg.visbesteval
    assert not cfg.crf
    assert not cfg.train          # cload default True
    cfg2 = parse_args(["-test", "-frozen"])
    assert not cfg2.live


def test_dead_flags_accepted():
    cfg = parse_args(["-grabcut", "-soft", "--lr", "0.1", "--runs", "3",
                      "-clippify"])
    assert cfg.runs == 3  # parsed, functional only via sandbox.multirun


def test_process_with_crf_outputs(handler, workdir):
    """-process -crf: the native CRF path through the CLI surface
    writes crf-mask PNGs (main.py:1169-1172,1220-1223)."""
    src = workdir / "crfimgs"
    src.mkdir(exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                     dtype=np.uint8)).save(
            src / f"c{i}.png")
    handler.cfg.crf = True
    handler.cfg.concatenated = False
    handler.cfg.mask_output_imgs = str(workdir / "crfout")
    try:
        out = handler.segment(str(src))
    finally:
        handler.cfg.crf = False
    names = os.listdir(workdir / "crfout")
    assert any(n.endswith("-crf-mask.png") for n in names)
    assert len(out["variants"]) == 3  # raw, thresholded, crf


def test_threaded_folder_io_matches_serial(handler, workdir,
                                           monkeypatch):
    """CGS_IO_THREADS > 1 (threaded PIL decode/encode in
    eval/segment.py) must produce byte-identical outputs and the same
    order/skip semantics as the serial path — incl. an unreadable
    file (skipped) and an extensionless one (ignored)."""
    from cgs_tpu.eval.segment import load_folder, segment_folder

    src = workdir / "thrimgs"
    src.mkdir(exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                     dtype=np.uint8)).save(
            src / f"t{i}.png")
    (src / "broken.png").write_bytes(b"not a png")
    (src / "READYFLAG").write_bytes(b"ignored")

    monkeypatch.setenv("CGS_IO_THREADS", "1")
    x1, stems1 = load_folder(str(src))
    monkeypatch.setenv("CGS_IO_THREADS", "4")
    x4, stems4 = load_folder(str(src))
    assert stems1 == stems4 == [f"t{i}" for i in range(5)]
    np.testing.assert_array_equal(x1, x4)

    pipe = handler._pipeline(False)
    handler.cfg.concatenated = False
    outs = {}
    for n in ("1", "4"):
        monkeypatch.setenv("CGS_IO_THREADS", n)
        d = workdir / f"throut{n}"
        segment_folder(handler.cfg, pipe, str(src), out_dir=str(d))
        outs[n] = {f: (d / f).read_bytes()
                   for f in sorted(os.listdir(d))}
    assert outs["1"] == outs["4"]
    assert any(f.endswith("-raw-mask.png") for f in outs["1"])


def test_process_video_input(handler, workdir):
    """-process on a VIDEO file (extension): decodes, resizes to
    64x64, writes {stem}_with_mask.mp4 with the concatenated strip /
    per-variant mp4s without it."""
    from cgs_tpu.utils.video import vidwrite

    rng = np.random.default_rng(2)
    src = workdir / "clip.mp4"
    vidwrite(str(src),
             rng.integers(0, 255, (12, 128, 96, 3), dtype=np.uint8),
             framerate=8)

    handler.cfg.concatenated = True
    handler.cfg.mask_output_imgs = str(workdir / "vidout")
    out = handler.segment(str(src))
    assert out["stems"] == ["clip"] and out["fps"] == 8.0
    assert out["variants"][0].shape == (12, 64, 64)
    strip = workdir / "vidout" / "clip_with_mask.mp4"
    assert strip.exists() and strip.stat().st_size > 0

    handler.cfg.concatenated = False
    handler.cfg.mask_output_imgs = str(workdir / "vidout2")
    handler.segment(str(src))
    names = os.listdir(workdir / "vidout2")
    assert "clip-raw-mask.mp4" in names
    assert "clip-thresholded-mask.mp4" in names


def test_live_flags_not_warned_dead(capsys):
    """-cleaned and -viscritic are READ by the reference
    (main.py:739,1567) — they must not trigger the dead-flag notice."""
    parse_args(["-cleaned", "-viscritic"])
    out = capsys.readouterr().out
    assert "unused" not in out

    parse_args(["-grabcut", "--runs", "3"])
    out = capsys.readouterr().out
    assert "unused" in out and "grabcut" in out and "runs" in out


def test_resimages_substitutes_input(tmp_path, monkeypatch):
    """-resimages replaces the eval X with ./resimgs.npy (loaded raw,
    main.py:922-925) and uses an all-zero GT; [100:5000:2] applies."""
    from cgs_tpu.eval.harness import load_eval_set

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    imgs = rng.random((300, 64, 64, 3)).astype(np.float32)
    np.save("resimgs.npy", imgs)
    cfg = Config(resimages=True, synthetic_data=True).derive()
    x, gt = load_eval_set(cfg)
    assert x.shape == (100, 64, 64, 3)      # 300 frames [100:5000:2]
    np.testing.assert_allclose(x, imgs[100:5000:2], atol=1e-6)
    assert gt.shape == (100, 64, 64) and not gt.any()

    # missing file -> clear error, not a bare FileNotFoundError
    monkeypatch.chdir(tmp_path / "..")
    with pytest.raises(RuntimeError, match="resimgs.npy"):
        load_eval_set(cfg)


def test_evaldatapath_flag(tmp_path):
    """--evaldatapath points load_eval_set at a custom X.npy/Y.npy dir
    (VERDICT r4 #5; the reference hard-codes "red-trees/",
    main.py:920-921); the [100:5000:2] slice and /255 + np.all GT
    binarization still apply."""
    from cgs_tpu.eval.harness import load_eval_set

    d = tmp_path / "my-dump"
    d.mkdir()
    r = np.random.default_rng(1)
    x = r.integers(0, 256, (300, 64, 64, 3)).astype(np.uint8)
    ygt = r.random((300, 64, 64, 3)) > 0.5
    np.save(d / "X.npy", x)
    np.save(d / "Y.npy", ygt)
    cfg = parse_args(["--evaldatapath", str(d)])
    assert cfg.evaldatapath == str(d)
    xe, gt = load_eval_set(cfg, evaldatapath=cfg.evaldatapath)
    np.testing.assert_allclose(
        xe, (x / 255.0)[100:5000:2].astype(np.float32), atol=1e-6)
    np.testing.assert_array_equal(gt, np.all(ygt, axis=-1)[100:5000:2])


def test_eval_video_reference_reordering(tmp_path, rng):
    """Column permutation matches main.py:1028-1032 for all three
    layout cases (crf+sal / crf only / neither)."""
    from cgs_tpu.eval.harness import render_eval_video

    n = 4
    x = rng.random((n, 64, 64, 3)).astype(np.float32)
    gt = rng.random((n, 64, 64)) > 0.8
    soft = rng.random((n, 64, 64)).astype(np.float32)
    hard = soft > 0.5
    base = {"mask": soft, "hard": hard}

    cases = [
        (dict(base), [0.5], 4),                     # no crf, no sal
        (dict(base, crf=hard), [0.5, 0.6], 5),      # crf only
        (dict(base, crf=hard, sal=soft, sal_hard=hard, sal_crf=hard),
         [0.5, 0.6, 0.2, 0.1], 8),                  # full layout
    ]
    import subprocess
    for i, (variants, ious, ncols) in enumerate(cases):
        p = tmp_path / f"v{i}.mp4"
        render_eval_video(str(p), x, gt, variants, ious)
        assert p.exists() and p.stat().st_size > 0
        # video width encodes the column count (64*scale(3) per col,
        # even-cropped)
        out = subprocess.run(
            ["python", "-c",
             "import cv2,sys;c=cv2.VideoCapture(sys.argv[1]);"
             "print(int(c.get(cv2.CAP_PROP_FRAME_WIDTH)))", str(p)],
            capture_output=True, text=True)
        width = int(out.stdout.strip())
        assert width == (ncols * 64 * 3) - ((ncols * 64 * 3) % 2), \
            (i, width)


def test_eval_video_max_frames_plumbed(tmp_path, rng):
    """--eval-video-max-frames caps the rendered frame count through
    evaluate() (VERDICT r3 #7: the full 2450-frame re-render burned
    minutes of 1-CPU host time per qualifying eval); 0 keeps the
    reference's full-length render."""
    import subprocess

    from cgs_tpu.core.config import Config
    from cgs_tpu.eval.harness import evaluate
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    from cgs_tpu.pipeline import MaskPipeline

    critic, masker = Critic(dropout=0.0), UnetDecoder()
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 3))
    cp = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": key}, x0, em)["params"]
    pipe = MaskPipeline(critic, masker,
                        {"critic": cp, "masker": mp}, batch_size=8)

    x = rng.random((12, 64, 64, 3)).astype(np.float32)
    gt = rng.random((12, 64, 64)) > 0.8

    def frame_count(path):
        out = subprocess.run(
            ["python", "-c",
             "import cv2,sys;c=cv2.VideoCapture(sys.argv[1]);"
             "print(int(c.get(cv2.CAP_PROP_FRAME_COUNT)))", path],
            capture_output=True, text=True)
        return int(out.stdout.strip())

    for cap, want in ((4, 4), (0, 12)):
        cfg = Config(eval_video_max_frames=cap).derive()
        out_dir = str(tmp_path / f"cap{cap}")
        res = evaluate(cfg, pipe, x, gt, out_dir=out_dir)
        assert "video" in res
        assert frame_count(res["video"]) == want
