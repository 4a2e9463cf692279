"""Legacy merge-training variants (reference TrainHandler.py:1098-1421
old pair training, :1697-1894 old single-net segment)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cgs_tpu.models.zoo import Unet
from cgs_tpu.sandbox.merge_variants import (
    bce_with_logits, distnorm_loss, make_pair_merge_step,
    make_single_net_merge_step, percentile_split)


def test_percentile_split_matches_reference_indexing():
    # TrainHandler.py:1153-1157: sorted[8*len//10] / sorted[2*len//10]
    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.random(100, dtype=np.float32))
    out = percentile_split(preds)
    s = np.sort(np.asarray(preds))
    assert float(out["high"]) == pytest.approx(s[80])
    assert float(out["low"]) == pytest.approx(s[20])
    assert int(out["highsel"].sum()) == 20
    assert int(out["lowsel"].sum()) == 21  # <= low is inclusive
    assert float(out["low"]) != float(out["high"])


def test_distnorm_golden_vs_torch_semantics():
    """Hand-rolled numpy reproduction of TrainHandler.py:1270-1287
    (including the xs^2 + xs^2 typo)."""
    rng = np.random.default_rng(1)
    z = rng.random((2, 8, 8, 1)).astype(np.float32)
    w = 8
    xs = np.broadcast_to(np.arange(w, dtype=np.float32) / w,
                         (2, 8, 8))[..., None]
    ys = np.broadcast_to((np.arange(w, dtype=np.float32) / w)[:, None],
                         (2, 8, 8))[..., None]
    xvote = (xs * z).mean(axis=(1, 2), keepdims=True)
    dx = xs - xvote
    dist = np.sqrt(dx ** 2 + dx ** 2)
    target = np.maximum(z - dist, 0.0)
    expect = 5.0 * np.mean((z - target) ** 2)
    got = float(distnorm_loss(jnp.asarray(z)))
    assert got == pytest.approx(expect, rel=1e-5)
    # fixed variant uses the true y-distance and differs
    yvote = (ys * z).mean(axis=(1, 2), keepdims=True)
    dy = ys - yvote
    distf = np.sqrt(dx ** 2 + dy ** 2)
    expectf = 5.0 * np.mean((z - np.maximum(z - distf, 0.0)) ** 2)
    gotf = float(distnorm_loss(jnp.asarray(z), fixed=True))
    assert gotf == pytest.approx(expectf, rel=1e-5)
    assert gotf != pytest.approx(got, rel=1e-3)


def test_bce_with_logits_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    logits = rng.standard_normal(64).astype(np.float32)
    targets = rng.random(64).astype(np.float32)
    want = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    got = float(bce_with_logits(jnp.asarray(logits),
                                jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.fixture(scope="module")
def unet_state():
    unet = Unet()
    params = unet.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, 64, 64, 3)))["params"]
    tx = optax.adam(2e-4)
    return unet, params, tx


def _frames(seed, n=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, 64, 64, 3), dtype=np.float32))


def test_single_net_merge_trains(unet_state):
    """With merge scoring frozen (collapse guard, see module
    docstring) the trainable signals are the live critic loss and the
    sparsity norm — both must decrease; everything stays finite."""
    unet, params, tx = unet_state
    step = make_single_net_merge_step(unet, tx, threshold=0.5,
                                      l1=0.1, live=True)
    opt_state = tx.init(params)
    x = _frames(3)
    y = jnp.asarray(np.random.default_rng(4).integers(0, 2, 8),
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    metrics = []
    p = params
    for i in range(6):
        p, opt_state, m = step(p, opt_state, x, y,
                               jax.random.fold_in(key, i))
        metrics.append({k: float(v) for k, v in m.items()})
        assert np.isfinite(metrics[-1]["loss"])
    assert metrics[-1]["critic"] < metrics[0]["critic"]
    assert metrics[-1]["norm"] < metrics[0]["norm"]
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     params, p)
    assert max(jax.tree.leaves(d)) > 0


def test_single_net_cluster_channels(unet_state):
    _, _, tx = unet_state
    k = 4
    unet = Unet(colorchs=3 + k)
    params = unet.init(jax.random.PRNGKey(1),
                       jnp.zeros((2, 64, 64, 3 + k)))["params"]
    step = make_single_net_merge_step(unet, tx, threshold=0.5,
                                      n_cluster_channels=k)
    opt_state = tx.init(params)
    x = _frames(5)
    chans = jnp.asarray(
        np.random.default_rng(6).integers(0, 2, (8, 64, 64, k)),
        jnp.float32)
    y = jnp.zeros(8)
    _, _, m = step(params, opt_state, x, y, jax.random.PRNGKey(2),
                   chans)
    assert np.isfinite(float(m["loss"]))


def test_pair_merge_step_trains_and_copy_freezes(unet_state):
    unet, params, tx = unet_state
    a, b = _frames(7), _frames(8)
    y = jnp.asarray(np.linspace(0, 1, 8), jnp.float32)

    step = make_pair_merge_step(unet, tx, l1=0.1, live=True)
    opt_state = tx.init(params)
    p = params
    losses = []
    for i in range(4):
        p, opt_state, m = step(p, opt_state, a, y, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # use_copy: merge-score gradient stops at the frozen snapshot,
    # so the encoder still learns only through Z / live loss — the
    # step must run and stay finite
    step_c = make_pair_merge_step(unet, tx, l1=0.1, use_copy=True)
    _, _, mc = step_c(params, tx.init(params), a, y, b)
    assert np.isfinite(float(mc["loss"]))


def test_pair_merge_noinject_drops_term(unet_state):
    unet, params, tx = unet_state
    a, b = _frames(9), _frames(10)
    y = jnp.zeros(8)
    step = make_pair_merge_step(unet, tx, inject=False, l1=0.1)
    _, _, m = step(params, tx.init(params), a, y, b)
    assert float(m["inject"]) == 0.0


def test_gaussian_blur_matches_torch_depthwise():
    """TrainHandler.py:274-282 blur kernels, vs torch groups=3 conv."""
    import torch
    import torch.nn.functional as F

    from cgs_tpu.ops.augment import gaussian_blur

    rng = np.random.default_rng(11)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for size, pad, div in [(3, 1, 16.0), (5, 2, 256.0)]:
        if size == 3:
            base = torch.tensor([[1, 2, 1], [2, 4, 2], [1, 2, 1]])
        else:
            base = torch.tensor([[1, 4, 6, 4, 1], [4, 16, 24, 16, 4],
                                 [6, 24, 36, 24, 6], [4, 16, 24, 16, 4],
                                 [1, 4, 6, 4, 1]])
        kern = torch.stack([base[None]] * 3).float() / div
        want = F.conv2d(xt, kern, padding=pad, groups=3)
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(gaussian_blur(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-6)
    # non-3/5 sizes are identity (quirk policy vs reference NameError)
    np.testing.assert_array_equal(
        np.asarray(gaussian_blur(jnp.asarray(x), 7)), x)


def test_single_net_merge_critic_head_gets_no_merge_gradient(unet_state):
    """Reference optimizer scoping (TrainHandler.py:1703-1704): the
    merge loss must not train the critic head (collapse guard) — with
    live=False the critic params receive ZERO gradient."""
    unet, params, tx = unet_state
    step = make_single_net_merge_step(unet, tx, threshold=0.5, l1=0.1)
    opt_state = tx.init(params)
    x = _frames(12)
    p, _, _ = step(params, opt_state, x, jnp.zeros(8),
                   jax.random.PRNGKey(0))
    for name in ("crit0", "crit1"):
        for leaf_a, leaf_b in zip(jax.tree.leaves(params[name]),
                                  jax.tree.leaves(p[name])):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_b))
    # but the decoder DID move (gradient through Z)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        params["dec0"], p["dec0"])))
    assert moved > 0


def test_pair_merge_nonlive_critic_frozen(unet_state):
    """live=False scores everything with frozen weights
    (TrainHandler.py:1112-1113): critic-head params must not move."""
    unet, params, tx = unet_state
    a, b = _frames(13), _frames(14)
    step = make_pair_merge_step(unet, tx, l1=0.1)  # live=False
    frozen = jax.tree.map(lambda v: v, params)  # setup-time snapshot
    p, _, m = step(params, tx.init(params), a, jnp.zeros(8), b,
                   frozen_params=frozen)
    for name in ("crit0", "crit1"):
        for la, lb in zip(jax.tree.leaves(params[name]),
                          jax.tree.leaves(p[name])):
            np.testing.assert_array_equal(np.asarray(la),
                                          np.asarray(lb))
    assert np.isfinite(float(m["loss"]))


def test_percentile_split_hundredths():
    rng = np.random.default_rng(5)
    preds = jnp.asarray(rng.random(200, dtype=np.float32))
    s = np.sort(np.asarray(preds))
    out = percentile_split(preds, hi=0.85, lo=0.15)
    assert float(out["high"]) == pytest.approx(s[170])
    assert float(out["low"]) == pytest.approx(s[30])
