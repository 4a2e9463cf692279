"""Full-grammar parity sweep: every flag the reference parser defines
(main.py:1462-1533) must be accepted by the cgs_tpu shim with the
same default value and the same parsed value when supplied."""

import pytest

from cgs_tpu.core.config import parse_args

# (flag, kind, reference default) transcribed from main.py:1463-1533
REFERENCE_STORE_TRUE = [
    "train", "cleaned", "frozen", "clippify", "debug", "noinject",
    "freeze", "viscritic", "vismasker", "visdataset", "trunk",
    "higheval", "separate", "salience", "process_salience", "grabcut",
    "crf", "directeval", "soft", "resimages", "noevalmode", "eval",
    "process", "test", "concatenated", "softmask",
]
# type=bool flags argparse can never turn off (main.py:1466-1484)
REFERENCE_BOOL_TRUE = [
    "masker", "critic", "cload", "mload", "staticnorm", "visbesteval",
    "salglobal",
]
REFERENCE_VALUED = {  # --flag: (default, sample override)
    "salience-thresh": (1.5, "2.5"),
    "eval-thresh": (0.05, "0.2"),
    "dropout": (0.3, "0.0"),
    "lr": (0.00005, "0.001"),
    "threshrew": (0.0, "0.5"),
    "trainasvis": (0, "7"),
    "false": (False, None),
    "envname": ("Treechop", "Navigate"),
    "visname": ("curves", "other"),
    "datamode": ("trunk", "begin"),
    "purevis": ("", "somevis"),
    "sortidx": (1, "2"),
    "chfak": (1, "2"),
    "shift": (12, "0"),
    "lfak": (5, "3"),
    "neck": (32, "64"),
    "clossfak": (5, "2"),
    "cepochs": (15, "1"),
    "mepochs": (1, "2"),
    "high-rew-thresh": (0.7, "0.8"),
    "low-rew-thresh": (0.3, "0.2"),
    "L2": (0.0, "0.1"),
    "L1": (0.5, "0.25"),
    "saveevery": (5, "1"),
    "visevery": (100, "10"),
    "rewidx": (1, "4"),
    "gammas": ("0.98-0.97-0.96-0.95", "0.9-0.8-0.7-0.6"),
    "testsize": (5000, "100"),
    "datasize": (100000, "1000"),
    # `name` is always overwritten post-parse (main.py:1539) — see
    # test_name_is_overwritten_by_model below.
    "name": ("default-model", None),
    "model": ("default-model", "m"),
    "runs": (1, "3"),
    "source-imgs": ("", "imgs"),
    "mask-output-imgs": ("results", "out"),
    "output-video": ("", "vids"),
    "binarymaskthreshold": (0.5, "0.1"),
}


def _attr(flag: str) -> str:
    return flag.replace("-", "_")


def test_every_store_true_flag_parses():
    cfg0 = parse_args([])
    for flag in REFERENCE_STORE_TRUE:
        assert getattr(cfg0, _attr(flag)) is False, flag
        cfg = parse_args([f"-{flag}"])
        assert getattr(cfg, _attr(flag)) is True, flag


def test_bool_typed_flags_default_true_and_cannot_disable():
    """main.py:1466-1484 quirk: `-masker False` parses bool('False')
    == True — the flags cannot be turned off from the CLI."""
    cfg0 = parse_args([])
    for flag in REFERENCE_BOOL_TRUE:
        assert getattr(cfg0, _attr(flag)) is True, flag
        cfg = parse_args([f"-{flag}", "False"])
        assert bool(getattr(cfg, _attr(flag))) is True, flag


def test_every_valued_flag_default_and_override():
    cfg0 = parse_args([])
    for flag, (default, sample) in REFERENCE_VALUED.items():
        got = getattr(cfg0, _attr(flag))
        assert got == default, (flag, got, default)
        if sample is None:
            continue
        cfg = parse_args([f"--{flag}", sample])
        got = getattr(cfg, _attr(flag))
        expect = type(default)(sample) if not isinstance(default, bool) \
            else bool(sample)
        assert got == expect, (flag, got, expect)


def test_name_is_overwritten_by_model():
    """main.py:1539 quirk: `args.name = args.model` runs unconditionally,
    so --name is accepted but has no effect."""
    assert parse_args(["--name", "n"]).name == "default-model"
    cfg = parse_args(["--name", "n", "--model", "m"])
    assert cfg.name == "m" and cfg.model == "m"


def test_full_kitchen_sink_invocation_parses():
    argv = [f"-{f}" for f in REFERENCE_STORE_TRUE]
    for flag, (default, sample) in REFERENCE_VALUED.items():
        if sample is not None:
            argv += [f"--{flag}", sample]
    cfg = parse_args(argv)
    # -test with the non-disableable cload=True forces train=False,
    # crf=False, salience=True (main.py:1540-1545) — even though -train
    # and -crf were passed explicitly.
    assert cfg.test and cfg.process
    assert cfg.train is False and cfg.crf is False and cfg.salience
    assert cfg.datasize == 1000


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit):
        parse_args(["--definitely-not-a-flag"])


def test_extension_batch_size_flag():
    assert parse_args([]).batch_size == 64
    assert parse_args(["--batch-size", "128"]).batch_size == 128


@pytest.mark.slow  # full two-phase train with per-epoch eval (~3 min, 1 CPU)
def test_directeval_wiring(tmp_path, monkeypatch):
    """-directeval runs eval() before each phase and per masker epoch,
    updating the best-IoU tracker only on improvement
    (handler.py:465-475; TrainHandler.py:1077-1080 — dead behind
    `if False:` in main.py:568-572). eval() itself is stubbed: the
    wiring and tracker comparisons are the behavior under test; the
    real eval path has its own e2e tests."""
    import numpy as np

    from cgs_tpu.core.config import Config
    from cgs_tpu.handler import Handler

    monkeypatch.chdir(tmp_path)
    cfg = Config(train=True, synthetic_data=True, datasize=400,
                 testsize=80, cepochs=1, mepochs=3, visevery=20,
                 dropout=0.0, shift=0, directeval=True,
                 contrastive_min=50, high_rew_thresh=0.4,
                 low_rew_thresh=0.6, model="derun").derive()
    h = Handler(cfg)
    h.load_data()

    calls = []
    fake = iter([(0.3, 0.1), (0.5, 0.2), (0.4, 0.15), (0.2, 0.0),
                 (0.45, 0.3)])

    def fake_eval():
        v = next(fake)
        calls.append(v)
        return v

    monkeypatch.setattr(h, "eval", fake_eval)
    h.critic_pipe()
    assert len(calls) == 1          # pre-phase eval (main.py:179-180)
    h.segmentation_training()
    # pre-phase (main.py:337-338) + one per mepoch
    assert len(calls) == 1 + 1 + cfg.mepochs
    # tracker: epoch evals were .4/.2/.45 -> best .45 at last epoch
    assert h.ious == (0.45, 0.3)
    assert h.bestepoch == cfg.mepochs - 1
