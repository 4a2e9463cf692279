"""Training-dynamics parity vs PyTorch (beyond forward parity):
gradients must agree to float tolerance, and with identical init +
batches the loss trajectories must stay statistically locked.

Note on tolerances: Adam's update is ~sign(g) while second-moment
estimates are cold, so ~1e-7 framework-level gradient noise on
near-zero entries produces sign flips and O(lr) parameter jitter that
compounds — pointwise trajectory equality past a few steps is not a
meaningful criterion for ANY two frameworks. Gradients ARE compared
pointwise; trajectories statistically (SURVEY.md §4 item 2 extended).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cgs_tpu.core.config import Config
from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.models.torch_interop import (
    CRITIC_KEYMAP, DECODER_KEYMAP, flax_to_torch_state,
    torch_state_to_flax,
)
from cgs_tpu.train.losses import build_critic_loss, build_masker_loss
from cgs_tpu.train.steps import (
    init_train_state, make_critic_step, make_optimizer,
)
from tests.test_torch_parity import TorchCritic, TorchDecoder

N_STEPS = 40


@pytest.fixture(scope="module")
def batches(rng):
    xs = rng.integers(0, 256, (N_STEPS, 16, 64, 64, 3), dtype=np.uint8)
    ys = rng.random((N_STEPS, 16)).astype(np.float32)
    return xs, ys


@pytest.fixture(scope="module")
def torch_critic():
    torch.manual_seed(0)
    return TorchCritic(dropout=0.0)


def test_critic_gradients_match_torch(batches, torch_critic):
    """d(MSE)/d(params) identical across frameworks (<=1e-6)."""
    xs, ys = batches
    tc = torch_critic
    fparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)

    xb = torch.from_numpy(xs[0].transpose(0, 3, 1, 2)).float() / 255.0
    yb = torch.from_numpy(ys[0])
    pred, _ = tc(xb)
    loss = torch.nn.functional.mse_loss(pred.squeeze(), yb)
    tc.zero_grad()
    loss.backward()
    tgrads = {k: v.grad.numpy() for k, v in
              zip(tc.state_dict().keys(), tc.parameters())}

    cfg = Config(shift=0, dropout=0.0)
    critic = Critic(dropout=0.0)
    loss_fn = build_critic_loss(cfg, critic)
    x = jnp.asarray(xs[0]).astype(jnp.float32) / 255.0
    jloss, jgrads = jax.value_and_grad(loss_fn)(
        fparams, x, jnp.asarray(ys[0]), jax.random.PRNGKey(0))

    # rtol 3e-5: cross-framework f32 conv/reduction accumulation runs
    # ~1e-5 relative and is DATA-dependent — the session-scoped rng
    # stream hands this test different draws depending on which
    # modules ran before it, so a 1e-5 bound flakes on unlucky
    # stream positions (root-caused r3; worst observed 1.6e-5)
    np.testing.assert_allclose(float(jloss), float(loss), rtol=3e-5)
    jgrads_t = flax_to_torch_state(
        jax.tree.map(np.asarray, jgrads), CRITIC_KEYMAP)
    for k, tg in tgrads.items():
        # atol floors near-zero entries; rtol covers O(0.1) grads,
        # where cross-framework f32 conv accumulation runs ~1e-5
        # relative (an atol-only bound fails on data whose grads land
        # a hair over it — seen at 2.03e-6 on a 0.125 bias grad)
        np.testing.assert_allclose(jgrads_t[k], tg, atol=1e-6,
                                   rtol=3e-5,
                                   err_msg=f"grad mismatch: {k}")


def test_critic_training_trajectory_statistically_locked(
        batches, torch_critic):
    xs, ys = batches
    tc = torch_critic
    fparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)

    opti = torch.optim.Adam(tc.parameters())  # defaults (main.py:178)
    tlosses = []
    for i in range(N_STEPS):
        xb = torch.from_numpy(
            xs[i].transpose(0, 3, 1, 2)).float() / 255.0
        yb = torch.from_numpy(ys[i])
        pred, _ = tc(xb)
        loss = torch.nn.functional.mse_loss(pred.squeeze(), yb)
        opti.zero_grad()
        loss.backward()
        opti.step()
        tlosses.append(float(loss))

    cfg = Config(shift=0, dropout=0.0)
    critic = Critic(dropout=0.0)
    tx = make_optimizer()
    state = init_train_state({"critic": fparams}, tx)
    step = make_critic_step(cfg, critic, tx)
    jlosses = []
    for i in range(N_STEPS):
        state, loss = step(state, jnp.asarray(xs[i]),
                           jnp.asarray(ys[i]), jax.random.PRNGKey(i))
        jlosses.append(float(loss))

    t = np.asarray(tlosses)
    j = np.asarray(jlosses)
    # step 0: pre-update forward -> tight
    np.testing.assert_allclose(j[0], t[0], rtol=1e-4)
    # first few steps stay close before Adam noise amplification
    np.testing.assert_allclose(j[:5], t[:5], rtol=0.02)
    # whole trajectory statistically locked
    rel = np.abs(j - t) / np.maximum(t, 1e-8)
    assert rel.mean() < 0.05, f"mean rel loss gap {rel.mean():.4f}"
    assert abs(j.mean() - t.mean()) / t.mean() < 0.03


@pytest.mark.parametrize("variant", ["default", "nonstatic_l2"])
def test_masker_loss_and_grads_match_torch(rng, variant):
    """Full masker-phase loss parity vs a torch mirror of
    main.py:360-429: loss value AND every gradient (critic + masker)
    agree pointwise. This pins the stop-grad topology numerically —
    detach() placement on negpred/pred/valuefak is exactly where the
    reference puts it (main.py:367,411,418).

    default:      live + inject + staticnorm + L1 (production flags)
    nonstatic_l2: valuefak = 1 - pred.detach(), L2, no inject
                  (the main.py:417-419,428 branch)
    """
    static = variant == "default"
    cfg = Config(dropout=0.0, shift=0,
                 staticnorm=static, noinject=not static,
                 L1=0.5 if static else 0.0,
                 L2=0.0 if static else 0.3).derive()
    assert cfg.live and cfg.inject is static

    torch.manual_seed(7)
    tc = TorchCritic(dropout=0.0)
    td = TorchDecoder()
    a_np = rng.random((6, 64, 64, 3)).astype(np.float32)
    b_np = rng.random((6, 64, 64, 3)).astype(np.float32)
    y_np = rng.random(6).astype(np.float32)

    # ---- torch side: the reference loss, verbatim topology ----
    A = torch.from_numpy(a_np.transpose(0, 3, 1, 2))
    B = torch.from_numpy(b_np.transpose(0, 3, 1, 2))
    Y = torch.from_numpy(y_np)
    pred, embeds = tc(A)
    pred = pred.squeeze()
    negpred = tc(B)[0].squeeze().detach()
    loss = cfg.lfak * F.mse_loss(pred, Y)
    Z = td(A, embeds)
    replaced = A * (1 - Z) + Z * B
    loss = loss + F.mse_loss(tc(replaced)[0].squeeze(), negpred)
    if cfg.inject:
        injected = B * (1 - Z) + Z * A
        loss = loss + F.mse_loss(tc(injected)[0].squeeze(),
                                 pred.detach())
    valuefak = 1 if static else 1 - pred.detach().view(-1, 1, 1, 1)
    if cfg.L1:
        loss = loss + cfg.L1 * F.l1_loss(valuefak * Z,
                                         torch.zeros_like(Z))
    if cfg.L2:
        loss = loss + cfg.L2 * F.mse_loss(valuefak * Z,
                                          torch.zeros_like(Z))
    loss.backward()
    tc_grads = {k: p.grad.numpy() for k, p in
                zip(tc.state_dict().keys(), tc.parameters())}
    td_grads = {k: p.grad.numpy() for k, p in
                zip(td.state_dict().keys(), td.parameters())}

    # ---- jax side: the production loss builder ----
    cparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)
    mparams = torch_state_to_flax(
        {k: v.numpy() for k, v in td.state_dict().items()},
        DECODER_KEYMAP)
    loss_fn = build_masker_loss(cfg, Critic(dropout=0.0), UnetDecoder())
    trainable = {"critic": cparams, "masker": mparams}
    (jloss, aux), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, {}, jnp.asarray(a_np), jnp.asarray(y_np),
        jnp.asarray(b_np), jax.random.PRNGKey(0))

    # rtol 3e-5: cross-framework f32 conv/reduction accumulation runs
    # ~1e-5 relative and is DATA-dependent — the session-scoped rng
    # stream hands this test different draws depending on which
    # modules ran before it, so a 1e-5 bound flakes on unlucky
    # stream positions (root-caused r3; worst observed 1.6e-5)
    np.testing.assert_allclose(float(jloss), float(loss), rtol=3e-5)
    jc = flax_to_torch_state(
        jax.tree.map(np.asarray, jgrads["critic"]), CRITIC_KEYMAP)
    jm = flax_to_torch_state(
        jax.tree.map(np.asarray, jgrads["masker"]), DECODER_KEYMAP)
    for k, tg in tc_grads.items():
        np.testing.assert_allclose(jc[k], tg, atol=2e-6, rtol=3e-5,
                                   err_msg=f"critic grad: {k}")
    for k, tg in td_grads.items():
        # rel+abs like the critic loop: the suite-order flake was THIS
        # line — masker.2.bias grad 0.124861 vs 0.124863 (rel 1.6e-5)
        # with session-rng-stream data, 1.3% over the old atol-only
        # 2e-6 bound
        np.testing.assert_allclose(jm[k], tg, atol=2e-6, rtol=3e-5,
                                   err_msg=f"masker grad: {k}")


@pytest.mark.parametrize("live,inject,separate",
                         [(True, True, False), (False, True, False),
                          (True, False, False), (True, True, True)])
def test_fused_critic_passes_gradient_equivalence(live, inject,
                                                  separate):
    """The fused critic-pass variants of build_masker_loss ('merges',
    'both') must reproduce the reference 4-call topology ('none')
    exactly at dropout=0: slicing a concatenated batch routes each
    cotangent only to its own rows (no cross-batch ops in the critic),
    so loss AND grads agree to float noise (VERDICT r2 item 2)."""
    cfg = Config(shift=0, dropout=0.0, live=live, inject=inject,
                 separate=separate).derive()
    critic, masker = Critic(dropout=0.0), UnetDecoder()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((4, 64, 64, 3))
    cparams = critic.init({"params": key}, x0, collect=True)["params"]
    _, em = critic.apply({"params": cparams}, x0, collect=True)
    mparams = masker.init({"params": key}, x0, em)["params"]
    trainable = {"critic": cparams, "masker": mparams}
    if separate:
        trainable["sepcrit"] = critic.init(
            {"params": jax.random.PRNGKey(9)}, x0,
            collect=True)["params"]

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((8, 64, 64, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((8, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random(8).astype(np.float32))

    got = {}
    for mode in ("none", "merges", "both"):
        loss_fn = build_masker_loss(cfg, critic, masker, fuse=mode)
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, {}, a, y, b,
                                   jax.random.PRNGKey(1))
        got[mode] = (float(loss), grads)

    ref_loss, ref_grads = got["none"]
    for mode in ("merges", "both"):
        loss, grads = got[mode]
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6)
        for ga, gb in zip(jax.tree.leaves(grads),
                          jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       atol=1e-7,
                                       err_msg=f"fuse={mode}")
