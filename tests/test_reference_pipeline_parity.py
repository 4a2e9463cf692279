"""Reference-source parity for the phases AROUND the loss math.

test_reference_parity.py pins the models and the training-step math
against /root/reference as shipped. This module extends the same
discipline to the two remaining numeric phases of the production
pipeline:

  * contrastive extraction (main.py:238-312): the reference's own
    `extract_contrastive_data` — threshold split semantics (strict
    > / <), bank assembly, label-row slicing — vs our jitted sweep
    (`train/contrastive.py`), compared by BANK CONTENT on identical
    critic weights;
  * evaluation (main.py:891-1101): the reference's own `eval()` run
    end-to-end on a fixture `red-trees/` dump — the [100:5000:2]
    slice, the np.all GT binarization, the strict-> hard threshold,
    and `get_iou` — vs our `eval/harness.evaluate`, compared on the
    exact hard-mask arrays (captured from the reference's own
    `get_iou` call) and the returned IoUs.

Both tests use the reference Handler itself (tests/reference_loader.py
shims); weights flow reference->flax through the production interop
keymaps so a transcription error on either side fails the test.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.models.torch_interop import (
    CRITIC_KEYMAP, DECODER_KEYMAP, torch_state_to_flax,
)
from tests.reference_loader import load_reference
from tests.test_reference_parity import (
    _make_handler, _ref_config, _state_np,
)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------
# get_iou (main.py:1265-1270)
# ---------------------------------------------------------------------

def test_reference_get_iou_matches_ops_iou(ref, rng, monkeypatch,
                                           tmp_path):
    """ops.iou pins the reference's integer-count ratio AND its
    round(..., 3)."""
    _, ref_main = ref
    handler = _make_handler(ref_main, _ref_config(), monkeypatch,
                            tmp_path)
    from cgs_tpu.ops.iou import iou
    for n in (1, 7, 64):
        a = rng.random((n, 64, 64)) > 0.7
        b = rng.random((n, 64, 64)) > 0.7
        assert iou(a, b) == handler.get_iou(a, b)


# ---------------------------------------------------------------------
# contrastive extraction (main.py:238-312)
# ---------------------------------------------------------------------

def _torch_preds(critic, X):
    """The reference's sweep math (main.py:245-253): batches of 128,
    NCHW float /255, eval mode."""
    critic = critic.eval()
    preds = []
    with torch.no_grad():
        for lo in range(0, len(X), 128):
            b = torch.from_numpy(
                X[lo:lo + 128].transpose(0, 3, 1, 2)).float() / 255.0
            preds.append(critic(b).squeeze())
    return torch.cat(preds).numpy()


def _gap_thresholds(sorted_preds, lo_idx, hi_idx):
    """(thr_lo, thr_hi, margin): both thresholds INSIDE the widest
    adjacent-prediction gap whose split position lies in
    [lo_idx, hi_idx] — thr_lo at 1/3, thr_hi at 2/3 of the gap, so
    every prediction sits >= margin = gap/3 away from both. The
    trained critic's predictions are bimodal (wander frames ~0.15,
    approach frames ~0.9; measured inter-cluster gap ~0.36 at n=4000)
    and dense inside each cluster (~1e-6 gaps), so mid-cluster
    thresholds could flip membership on the <1e-5 torch-vs-flax
    forward delta; a wide-gap placement makes membership parity test
    the SEMANTICS (strict compare, bank slicing), not float luck.
    Frames between the thresholds (none here) would land in neither
    bank on both sides alike (main.py:266-267)."""
    gaps = np.diff(sorted_preds)
    i = lo_idx + int(np.argmax(gaps[lo_idx:hi_idx + 1]))
    lo, g = sorted_preds[i], gaps[i]
    return float(lo + g / 3), float(lo + 2 * g / 3), float(g / 3)


def _train_critic_briefly(critic, X, y, steps=150):
    """~60 torch Adam steps on the value-regression objective
    (main.py:205-212 math): a FRESH NewCritic's sigmoid outputs span
    only ~4e-4 (measured), so adjacent sorted predictions tie at
    float32 resolution and no threshold can sit mid-gap; the
    reference always extracts AFTER the critic phase, so a lightly
    trained critic is also the faithful fixture."""
    critic = critic.train()
    opt = torch.optim.Adam(critic.parameters(), lr=1e-3)
    gen = torch.Generator().manual_seed(0)
    for _ in range(steps):
        idx = torch.randint(0, len(X), (64,), generator=gen)
        b = torch.from_numpy(
            X[idx.numpy()].transpose(0, 3, 1, 2)).float() / 255.0
        loss = torch.nn.functional.mse_loss(
            critic(b).squeeze(), torch.from_numpy(y[idx.numpy()]))
        opt.zero_grad()
        loss.backward()
        opt.step()


def test_reference_contrastive_split_parity(ref, rng, monkeypatch,
                                            tmp_path):
    _, ref_main = ref
    cfg = _ref_config()           # critic=True (main.py:244 branch)
    handler = _make_handler(ref_main, cfg, monkeypatch, tmp_path)
    os.makedirs(handler.path, exist_ok=True)   # histogram PNGs

    n = 4000
    from cgs_tpu.data.synthetic import synthetic_dataset
    X, Y, _ = synthetic_dataset(n, seed=11)
    handler.X, handler.Y = X, Y
    _train_critic_briefly(handler.critic, X, Y[cfg.rewidx])

    # both thresholds inside the widest inter-cluster gap that leaves
    # >=500 frames on each side (the main.py:281 assert; positives
    # capped so negatives stay >=500 too)
    preds = _torch_preds(handler.critic, X)
    s = np.sort(preds)
    thr_lo, thr_hi, margin = _gap_thresholds(s, 499, n - 502)
    assert margin > 1e-3, (
        "fixture degenerate: no wide inter-cluster gap — retune the "
        "brief critic training")
    handler.args.high_rew_thresh = thr_hi
    handler.args.low_rew_thresh = thr_lo

    handler.extract_contrastive_data()   # the reference's own code

    # our side: same weights through the production interop keymap
    from cgs_tpu.train.contrastive import extract_contrastive_sets
    cfg2 = _ref_config(high_rew_thresh=thr_hi, low_rew_thresh=thr_lo)
    cparams = torch_state_to_flax(_state_np(handler.critic),
                                  CRITIC_KEYMAP)
    sets = extract_contrastive_sets(
        cfg2, Critic(dropout=0.0), cparams, jnp.asarray(X),
        Y[cfg2.rewidx], np.random.default_rng(0))

    # bank CONTENT equality (distinct frames: equality <=> the same
    # membership in the same order, main.py:283-287)
    assert sets.n_pos >= 500 and sets.n_neg >= 500
    assert sets.n_pos == handler.Xpos.shape[0]
    assert sets.n_neg == handler.Xneg.shape[0]
    np.testing.assert_array_equal(np.asarray(sets.xpos), handler.Xpos)
    np.testing.assert_array_equal(np.asarray(sets.xneg), handler.Xneg)
    # label banks: ours keeps row rewidx only (the one row the masker
    # phase reads, main.py:345-347); the reference keeps all 7
    np.testing.assert_array_equal(
        np.asarray(sets.ypos), handler.Ypos[cfg2.rewidx])
    np.testing.assert_array_equal(
        np.asarray(sets.yneg), handler.Yneg[cfg2.rewidx])
    # the reference's index-sampler domain (main.py:306-312) == ours
    assert len(handler.XposIdxs) == sets.n_pos
    assert len(handler.ContrastIdxs) == sets.n_neg


# ---------------------------------------------------------------------
# eval (main.py:891-1101)
# ---------------------------------------------------------------------

def test_reference_eval_parity(ref, rng, monkeypatch, tmp_path):
    """Run the reference's OWN eval() on a fixture red-trees dump and
    pin: frame slicing + GT construction + hard threshold (the exact
    boolean arrays its get_iou receives) and the returned IoU, vs
    `eval/harness` on the same weights."""
    _, ref_main = ref
    # visbesteval off: the video writer needs the stubbed ffmpeg
    # module (reference_loader docstring) and is covered by our own
    # renderer tests
    cfg = _ref_config(visbesteval=False)
    handler = _make_handler(ref_main, cfg, monkeypatch, tmp_path)

    # fixture red-trees/ in the tmp cwd, reference layout
    # (main.py:920-925): X.npy uint8, Y.npy RGB-triplicated bool GT
    from cgs_tpu.data.synthetic import synthetic_eval_set
    xu8, gt = synthetic_eval_set(n_frames=700, seed=7)
    os.makedirs("red-trees")
    np.save("red-trees/X.npy", xu8)
    np.save("red-trees/Y.npy", np.repeat(gt[..., None], 3, axis=-1))

    captured = {}
    real_get_iou = handler.get_iou

    def spy_get_iou(A, B):
        captured["hard"], captured["gt"] = A, B
        return real_get_iou(A, B)

    monkeypatch.setattr(handler, "get_iou", spy_get_iou)
    ref_ious = handler.eval()
    assert len(ref_ious) == 1            # no crf / no salience

    # our side, same weights, same cwd fixture
    from cgs_tpu.eval.harness import evaluate, load_eval_set
    from cgs_tpu.pipeline import MaskPipeline
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    params = {
        "critic": torch_state_to_flax(_state_np(handler.critic),
                                      CRITIC_KEYMAP),
        "masker": torch_state_to_flax(_state_np(handler.masker),
                                      DECODER_KEYMAP),
    }
    pipe = MaskPipeline(critic, masker, params, batch_size=128,
                        eval_mode=not cfg.noevalmode, seed=cfg.seed)
    x, gt2 = load_eval_set(cfg, evaldatapath="red-trees/")
    assert x.shape[0] == 300             # [100:5000:2] of 700
    res = evaluate(cfg, pipe, x, gt2, write=False)

    # the exact boolean surfaces the reference's get_iou consumed
    hard_ours = res["variants"]["hard"]
    np.testing.assert_array_equal(np.asarray(captured["gt"], bool), gt2)
    np.testing.assert_array_equal(hard_ours,
                                  np.asarray(captured["hard"], bool))
    assert res["ious"] == ref_ious
