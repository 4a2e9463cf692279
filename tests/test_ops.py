"""Golden tests for the pure ops against straight-numpy re-derivations
of the reference semantics (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.ops.augment import shift_batch
from cgs_tpu.ops.discount import build_label_matrix, discount_rewards
from cgs_tpu.ops.iou import iou, iou_counts
from cgs_tpu.ops.merge import inject_merge, replace_merge
from cgs_tpu.ops.saliency import (
    normalize_saliency_global, normalize_saliency_topk,
)


def ref_discount(reward, gamma):
    """Literal numpy transcription of main.py:1341-1344."""
    r = reward.astype(np.float64).copy()
    for i in range(2, len(r) + 1):
        r[-i] = min(r[-i] + gamma * r[-i + 1], 1)
    return r


def test_discount_matches_reference_recursion(rng):
    reward = (rng.random(500) > 0.97).astype(np.float32)
    for gamma in (0.98, 0.97, 0.96, 0.95):
        ours = np.asarray(discount_rewards(jnp.asarray(reward), gamma))
        np.testing.assert_allclose(ours, ref_discount(reward, gamma),
                                   rtol=1e-5)


def test_discount_caps_at_one():
    reward = np.ones(10, np.float32)
    out = np.asarray(discount_rewards(jnp.asarray(reward), 0.98))
    assert (out <= 1.0).all() and out[0] == 1.0


def test_label_matrix_layout(rng):
    reward = (rng.random(100) > 0.9).astype(np.float32) * 3.0
    y = np.asarray(build_label_matrix(jnp.asarray(reward)))
    assert y.shape == (7, 100)
    np.testing.assert_array_equal(y[0], (reward > 0).astype(np.float32))
    assert (y[5] == 0).all() and (y[6] == 0).all()
    np.testing.assert_allclose(
        y[1], ref_discount((reward > 0).astype(np.float32), 0.98),
        rtol=1e-5)


def test_merge_ops(rng):
    a = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    b = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    z = jnp.asarray(rng.random((2, 8, 8, 1)), jnp.float32)
    rep = np.asarray(replace_merge(a, b, z))
    inj = np.asarray(inject_merge(a, b, z))
    np.testing.assert_allclose(
        rep, np.asarray(a) * (1 - np.asarray(z)) +
        np.asarray(z) * np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(
        inj, np.asarray(b) * (1 - np.asarray(z)) +
        np.asarray(z) * np.asarray(a), rtol=1e-6)
    # z=0 -> identity; z=1 -> full swap
    zeros = jnp.zeros_like(z)
    np.testing.assert_array_equal(np.asarray(replace_merge(a, b, zeros)),
                                  np.asarray(a))
    ones = jnp.ones_like(z)
    np.testing.assert_array_equal(np.asarray(replace_merge(a, b, ones)),
                                  np.asarray(b))


def test_shift_batch_is_circular_roll(rng):
    x = jnp.asarray(rng.integers(0, 255, (3, 16, 16, 3)), jnp.uint8)
    out = shift_batch(jax.random.PRNGKey(4), x, 12)
    assert out.shape == x.shape
    # content preserved per row (circular shift only moves columns)
    np.testing.assert_array_equal(
        np.sort(np.asarray(out), axis=2), np.sort(np.asarray(x), axis=2))
    # shift=0 flag handled upstream; max_shift=1 -> xshift=0 -> identity
    out0 = shift_batch(jax.random.PRNGKey(4), x, 1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


def test_iou_golden():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True   # 8 px
    b[1:3] = True  # 8 px, overlap 4
    assert iou(jnp.asarray(a), jnp.asarray(b)) == round(4 / 12, 3)
    i, u = iou_counts(jnp.asarray(a), jnp.asarray(b))
    assert int(i) == 4 and int(u) == 12


def test_saliency_global_norm(rng):
    sal = jnp.asarray(rng.random((5, 8, 8, 1)), jnp.float32)
    preds = jnp.asarray(rng.random(5), jnp.float32)
    thresh = 1.5
    soft, hard = normalize_saliency_global(sal, preds, thresh)
    # reference math (main.py:980-995)
    s = np.asarray(sal)
    norm = (s * (s >= 0)).mean() * thresh
    expect = s / (norm + np.finfo(float).tiny)
    expect = expect * np.asarray(preds)[:, None, None, None]
    expect[expect >= 1] = 1
    np.testing.assert_allclose(np.asarray(soft), expect, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hard),
                                  (expect > thresh).astype(np.uint8))


def test_saliency_topk_norm(rng):
    sal = jnp.asarray(rng.random((3, 8, 8, 1)), jnp.float32)
    preds = jnp.ones(3, jnp.float32)
    thresh = 0.5
    soft, hard = normalize_saliency_topk(sal, preds, thresh)
    s = np.asarray(sal).reshape(3, -1)
    k = int(8 * 8 * thresh)
    norm = np.sort(s, axis=-1)[:, k]
    expect = np.asarray(sal) / (norm[:, None, None, None] +
                                np.finfo(float).tiny)
    expect[expect >= 1] = 1
    np.testing.assert_allclose(np.asarray(soft), expect, rtol=1e-5)
    assert hard.shape == sal.shape


def test_iou_union_zero_returns_zero():
    """Both masks empty (folder eval's zero GT + empty prediction):
    0.0, not the reference's ZeroDivisionError (quirk policy)."""
    z = jnp.zeros((4, 4), bool)
    assert iou(z, z) == 0.0
