"""Grad-flow and semantics tests for the jitted train steps
(SURVEY.md §7.3 — the three-forward masker step is easy to get subtly
wrong)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.train.steps import (
    init_train_state, make_critic_step, make_masker_step, make_optimizer,
)

KEY = jax.random.PRNGKey(0)


def build(cfg):
    critic = Critic(dropout=cfg.dropout)
    masker = UnetDecoder()
    x = jnp.zeros((2, 64, 64, 3))
    cparams = critic.init({"params": KEY}, x, collect=True)["params"]
    _, embeds = critic.apply({"params": cparams}, x, collect=True)
    mparams = masker.init({"params": KEY}, x, embeds)["params"]
    params = {"critic": cparams, "masker": mparams}
    if cfg.separate:
        params["sepcrit"] = critic.init(
            {"params": jax.random.PRNGKey(7)}, x, collect=True)["params"]
    return critic, masker, params


def batch(rng, n=8):
    a = rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)
    y = rng.random(n).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(y), jnp.asarray(b)


def snapshot(tree):
    return jax.tree.map(lambda x: np.array(x), tree)


def tree_equal(a, b):
    return all(jax.tree.leaves(jax.tree.map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))),
        a, b)))


def test_critic_step_reduces_loss(rng):
    cfg = Config(shift=0, dropout=0.0)
    critic, _, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state({"critic": params["critic"]}, tx)
    step = make_critic_step(cfg, critic, tx)
    a, _, _ = batch(rng, 16)
    # learnable target: mean brightness of the frame
    y = jnp.mean(a.astype(jnp.float32) / 255.0, axis=(1, 2, 3))
    losses = []
    for i in range(150):
        state, loss = step(state, a, y, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


@pytest.mark.parametrize("live", [True, False])
def test_masker_step_gradient_routing(rng, live):
    """live: critic params move; frozen: critic params must be
    untouched (main.py:330-334)."""
    cfg = Config(shift=0, dropout=0.0, frozen=not live).derive()
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    trained = ["masker"] + (["critic"] if live else [])
    state = init_train_state(params, tx, trained_keys=trained)
    step = make_masker_step(cfg, critic, masker, tx)
    a, y, b = batch(rng)
    before = snapshot(params)
    new_state, metrics = step(state, a, y, b, KEY)
    assert not tree_equal(new_state.params["masker"], before["masker"])
    critic_moved = not tree_equal(new_state.params["critic"],
                                  before["critic"])
    assert critic_moved == live
    for k in ("replace", "inject", "norm", "loss"):
        assert np.isfinite(float(metrics[k]))


def test_masker_step_noinject(rng):
    cfg = Config(shift=0, dropout=0.0, noinject=True).derive()
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state(params, tx, ["masker", "critic"])
    step = make_masker_step(cfg, critic, masker, tx)
    a, y, b = batch(rng)
    _, metrics = step(state, a, y, b, KEY)
    assert float(metrics["inject"]) == 0.0


def test_masker_step_separate_critic(rng):
    """-separate: masker consumes sepcrit embeds; sepcrit trains too
    (main.py:327-334,389-390)."""
    cfg = Config(shift=0, dropout=0.0, separate=True).derive()
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state(params, tx, ["masker", "critic", "sepcrit"])
    step = make_masker_step(cfg, critic, masker, tx)
    a, y, b = batch(rng)
    before = snapshot(params)
    new_state, _ = step(state, a, y, b, KEY)
    assert not tree_equal(new_state.params["sepcrit"], before["sepcrit"])


def test_stop_gradients_block_targets(rng):
    """The targets (negpred, detached pred) must carry no gradient:
    with lfak=0 + frozen + no sparsity, the loss must not move the
    critic even though critic outputs feed every loss term."""
    cfg = Config(shift=0, dropout=0.0, frozen=True, L1=0.0).derive()
    assert not cfg.live
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state(params, tx, ["masker"])
    step = make_masker_step(cfg, critic, masker, tx)
    a, y, b = batch(rng)
    before = snapshot(params)
    new_state, metrics = step(state, a, y, b, KEY)
    assert tree_equal(new_state.params["critic"], before["critic"])
    assert float(metrics["norm"]) == 0.0


def test_critic_lr_scale_semantics(rng):
    """--critic-lr-scale (extension, train/steps.py:make_optimizer):
    1.0 must be the bit-exact reference optimizer; 0.0 must leave the
    live critic immovable while the masker trains; 0.5 must exactly
    halve the critic's first-step delta (same fresh Adam state) and
    leave the masker's delta untouched."""
    cfg = Config(shift=0, dropout=0.0).derive()
    assert cfg.live
    critic, masker, params = build(cfg)
    a, y, b = batch(rng)
    before = snapshot(params)

    def one_step(scale):
        tx = make_optimizer(scale)
        # fresh device copies per run: the step donates its state,
        # so reusing one params dict across runs passes deleted
        # buffers on the second call
        fresh = jax.tree.map(jnp.asarray, before)
        state = init_train_state(fresh, tx, ["masker", "critic"])
        step = make_masker_step(cfg, critic, masker, tx)
        new_state, _ = step(state, a, y, b, KEY)
        return new_state.params

    ref = one_step(1.0)          # plain adam (identity fast path)
    p0 = one_step(0.0)
    p5 = one_step(0.5)

    assert not tree_equal(ref["critic"], before["critic"])
    assert tree_equal(p0["critic"], before["critic"])     # immovable
    assert not tree_equal(p0["masker"], before["masker"])  # trains
    # masker untouched by the critic mask
    for l1, l2 in zip(jax.tree.leaves(ref["masker"]),
                      jax.tree.leaves(p5["masker"])):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # first-step critic delta exactly halves
    for l1, l5, lb in zip(jax.tree.leaves(ref["critic"]),
                          jax.tree.leaves(p5["critic"]),
                          jax.tree.leaves(before["critic"])):
        # the two runs are separately-compiled programs; allow float
        # reassociation noise around the exact halving
        np.testing.assert_allclose(np.asarray(l5) - np.asarray(lb),
                                   (np.asarray(l1) - np.asarray(lb))
                                   / 2.0, rtol=1e-3, atol=1e-7)


def test_critic_lr_scale_noop_without_critic(rng):
    """With -frozen the optimizer target has no 'critic' entry; the
    masked scale must be a structural no-op, not an error."""
    cfg = Config(shift=0, dropout=0.0, frozen=True).derive()
    critic, masker, params = build(cfg)
    before = snapshot(params)          # before the donating step
    tx = make_optimizer(0.25)
    state = init_train_state(params, tx, ["masker"])
    step = make_masker_step(cfg, critic, masker, tx)
    a, y, b = batch(rng)
    new_state, _ = step(state, a, y, b, KEY)
    assert not tree_equal(new_state.params["masker"], before["masker"])


def test_masker_nonstatic_norm(rng):
    cfg = Config(shift=0, dropout=0.0).derive()
    cfg2 = dataclasses.replace(cfg, staticnorm=False)
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    a, y, b = batch(rng)
    outs = []
    for c in (cfg, cfg2):
        state = init_train_state(snapshot(params), tx,
                                 ["masker", "critic"])
        _, metrics = make_masker_step(c, critic, masker, tx)(
            state, a, y, b, KEY)
        outs.append(float(metrics["norm"]))
    # staticnorm weights every pixel by 1; value-norm weights by
    # (1 - pred) < 1, so it must be strictly smaller for the same Z
    assert outs[1] < outs[0]


def test_l2_sparsity_branch(rng):
    cfg = Config(shift=0, dropout=0.0, L1=0.0, L2=0.5).derive()
    critic, masker, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state(params, tx, ["masker", "critic"])
    _, metrics = make_masker_step(cfg, critic, masker, tx)(
        state, *batch(rng), KEY)
    assert float(metrics["norm"]) > 0.0


def test_threshrew_bce_branch(rng):
    """--threshrew: labels binarized + BCE replaces MSE
    (main.py:120-122,192-195)."""
    cfg = Config(shift=0, dropout=0.0, threshrew=0.5)
    critic, _, params = build(cfg)
    tx = make_optimizer()
    state = init_train_state({"critic": params["critic"]}, tx)
    step = make_critic_step(cfg, critic, tx)
    a, _, _ = batch(rng)
    y = (rng.random(8) > 0.5).astype(np.float32)
    state, loss = step(state, a, jnp.asarray(y), KEY)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_bce_matches_torch_clamp_at_saturation():
    """bce() reproduces torch F.binary_cross_entropy's -100 log clamp:
    saturated sigmoid outputs (exact 0/1 in f32) yield loss 100 per
    wrong element, not inf/NaN, and gradients stay finite."""
    import torch
    import torch.nn.functional as F

    from cgs_tpu.train.losses import bce

    pred = np.asarray([0.0, 1.0, 0.5, 1e-20, 1.0 - 1e-7], np.float32)
    target = np.asarray([1.0, 0.0, 0.5, 1.0, 0.0], np.float32)
    ours = float(bce(jnp.asarray(pred), jnp.asarray(target)))
    theirs = float(F.binary_cross_entropy(torch.tensor(pred),
                                          torch.tensor(target)))
    assert abs(ours - theirs) < 1e-3 * max(1.0, theirs), (ours, theirs)
    g = jax.grad(lambda p: bce(p, jnp.asarray(target)))(
        jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))


def test_norm_logging_matches_reference_overwrite(rng):
    """With BOTH L1 and L2 on, the logged 'norm' is the L2 term only
    (the reference overwrites normloss, main.py:421-429) while the
    total loss contains both."""
    from cgs_tpu.core.config import Config
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    from cgs_tpu.train.losses import build_masker_loss

    import jax
    import jax.numpy as jnp

    cfg = Config(dropout=0.0, shift=0, L1=0.5, L2=4.0).derive()
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    a = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.random(2).astype(np.float32))
    k = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 3))
    cp = critic.init({"params": k}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cp}, x0, collect=True)
    mp = masker.init({"params": k}, x0, em)["params"]

    loss_fn = build_masker_loss(cfg, critic, masker)
    (_, aux), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        {"critic": cp, "masker": mp}, {}, a, y, b, k)
    z = np.asarray(aux["z"])
    l2_term = 4.0 * np.mean(z ** 2)       # staticnorm: vf == 1
    l1_term = 0.5 * np.mean(np.abs(z))
    np.testing.assert_allclose(float(aux["norm"]), l2_term, rtol=1e-5)
    assert abs(float(aux["norm"]) - (l1_term + l2_term)) > 1e-6


def test_bf16_training_steps(rng):
    """--bf16 training (handler.py:79-86): bfloat16 conv compute with
    float32 params, grads, and optimizer state. The critic step must
    still learn, the masker step's metrics must be finite, and no
    param or opt-state leaf may silently downcast to bf16."""
    cfg = Config(shift=0, dropout=0.0).derive()
    critic = Critic(dropout=cfg.dropout, compute_dtype=jnp.bfloat16)
    masker = UnetDecoder(compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, 64, 64, 3))
    cparams = critic.init({"params": KEY}, x0, collect=True)["params"]
    _, embeds = critic.apply({"params": cparams}, x0, collect=True)
    mparams = masker.init({"params": KEY}, x0, embeds)["params"]

    tx = make_optimizer()
    state = init_train_state({"critic": cparams}, tx)
    step = make_critic_step(cfg, critic, tx)
    a, _, b = batch(rng, 16)
    y = jnp.mean(a.astype(jnp.float32) / 255.0, axis=(1, 2, 3))
    losses = []
    for i in range(80):
        state, loss = step(state, a, y, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7
    for leaf in jax.tree.leaves((state.params, state.opt_state)):
        assert leaf.dtype != jnp.bfloat16, "f32 master state downcast"

    mstate = init_train_state(
        {"critic": jax.tree.map(np.asarray, state.params["critic"]),
         "masker": mparams}, make_optimizer(), ["masker", "critic"])
    mstep = make_masker_step(cfg, critic, masker, make_optimizer())
    mstate, metrics = mstep(mstate, a[:8], y[:8], b[:8], KEY)
    for k in ("replace", "inject", "norm", "loss", "critic"):
        assert np.isfinite(float(metrics[k])), (k, metrics)
    for leaf in jax.tree.leaves(mstate.params):
        assert leaf.dtype != jnp.bfloat16
