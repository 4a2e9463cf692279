"""Numerical parity vs a PyTorch implementation of the published
architecture (SURVEY.md §4 item 2).

We build the two production nets in torch from the paper/nets.py spec,
copy the weights into the flax modules via the .pt interop layer, and
assert forward deltas < 1e-5 on random frames (dropout disabled, which
is the reference's eval mode)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from cgs_tpu.models.critic import Critic
from cgs_tpu.models.decoder import UnetDecoder
from cgs_tpu.models.torch_interop import (
    CRITIC_KEYMAP, DECODER_KEYMAP, torch_state_to_flax,
)


class TorchCritic(tnn.Module):
    """Reference NewCritic spec (nets.py:160-212), chfak=1, neck=32."""

    def __init__(self, dropout=0.3):
        super().__init__()
        pool = tnn.MaxPool2d(2)
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 8, 3, 1, 1), tnn.ReLU(), pool,
            tnn.Conv2d(8, 8, 3, 1, 1), tnn.ReLU(), pool,
            tnn.Conv2d(8, 8, 3, 1, 1), tnn.ReLU(), pool,
            tnn.Dropout(dropout),
            tnn.Conv2d(8, 16, 3, 1, 1), tnn.ReLU(), pool,
            tnn.Dropout(dropout),
            tnn.Conv2d(16, 32, 4), tnn.ReLU())
        self.crit = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(32, 32), tnn.ReLU(),
            tnn.Dropout(dropout), tnn.Linear(32, 1), tnn.Sigmoid())

    def forward(self, x):
        embeds = []
        for layer in self.features:
            x = layer(x)
            if isinstance(layer, tnn.MaxPool2d):
                embeds.append(x)
        embeds.append(x)
        return self.crit(x), embeds


class TorchDecoder(tnn.Module):
    """Reference UnetDecoder spec (nets.py:452-523), chfak=1."""

    def __init__(self):
        super().__init__()
        self.dec_model = tnn.Sequential(
            tnn.Conv2d(8 + 8, 8, 3, 1, 1),
            tnn.Conv2d(8 + 8, 8, 3, 1, 1),
            tnn.Conv2d(8 + 16, 8, 3, 1, 1),
            tnn.Conv2d(16 + 32, 16, 3, 1, 1),
            tnn.Conv2d(32, 32, 1, 1, 0))
        self.masker = tnn.Sequential(
            tnn.Conv2d(3 + 8, 16, 3, 1, 1), tnn.LeakyReLU(0.01),
            tnn.Conv2d(16, 1, 3, 1, 1), tnn.Sigmoid())

    def forward(self, x, embeds):
        dec = self.dec_model
        ups = tnn.Upsample(scale_factor=(2, 2))
        out4 = dec[4](embeds[4])
        out3 = dec[3](torch.cat((embeds[3], ups(ups(out4))), dim=1))
        out2 = dec[2](torch.cat((embeds[2], ups(out3)), dim=1))
        out1 = dec[1](torch.cat((embeds[1], ups(out2)), dim=1))
        out0 = dec[0](torch.cat((embeds[0], ups(out1)), dim=1))
        return self.masker(torch.cat((x, ups(out0)), dim=1))


@pytest.fixture(scope="module")
def frames(rng):
    return rng.random((4, 64, 64, 3)).astype(np.float32)


def test_critic_forward_parity(frames):
    torch.manual_seed(0)
    tc = TorchCritic().eval()
    with torch.no_grad():
        tpred, tembeds = tc(torch.from_numpy(
            frames.transpose(0, 3, 1, 2)))

    fparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)
    pred, embeds = Critic().apply({"params": fparams},
                                  jax.numpy.asarray(frames),
                                  collect=True)
    np.testing.assert_allclose(np.asarray(pred),
                               tpred.numpy(), atol=1e-5)
    for fe, te in zip(embeds, tembeds):
        np.testing.assert_allclose(
            np.asarray(fe), te.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_masker_forward_parity(frames):
    torch.manual_seed(1)
    tc = TorchCritic().eval()
    td = TorchDecoder().eval()
    x_t = torch.from_numpy(frames.transpose(0, 3, 1, 2))
    with torch.no_grad():
        _, tembeds = tc(x_t)
        tmask = td(x_t, tembeds)

    cparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)
    dparams = torch_state_to_flax(
        {k: v.numpy() for k, v in td.state_dict().items()},
        DECODER_KEYMAP)
    x = jax.numpy.asarray(frames)
    _, embeds = Critic().apply({"params": cparams}, x, collect=True)
    mask = UnetDecoder().apply({"params": dparams}, x, embeds)
    np.testing.assert_allclose(
        np.asarray(mask), tmask.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)


def test_pt_roundtrip(tmp_path, frames):
    """flax -> .pt -> flax roundtrips bit-exactly."""
    from cgs_tpu.models.torch_interop import load_pt_critic, save_pt
    x = jax.numpy.asarray(frames)
    params = Critic().init({"params": jax.random.PRNGKey(3)}, x)["params"]
    path = str(tmp_path / "critic.pt")
    save_pt(params, CRITIC_KEYMAP, path)
    back = load_pt_critic(path)
    for name, leaf in params.items():
        np.testing.assert_array_equal(np.asarray(leaf["kernel"]),
                                      back[name]["kernel"])
        np.testing.assert_array_equal(np.asarray(leaf["bias"]),
                                      back[name]["bias"])


def test_northstar_mask_iou_vs_torch(rng):
    """BASELINE.json north-star: mask IoU >= 0.99 vs the PyTorch
    reference from the same weights (red-trees/X.npy is stripped from
    this mirror, so frames come from the synthetic eval set)."""
    from cgs_tpu.data.synthetic import synthetic_eval_set

    torch.manual_seed(7)
    tc = TorchCritic().eval()
    td = TorchDecoder().eval()
    xu8, _ = synthetic_eval_set(n_frames=256, seed=11)
    x = (xu8 / 255.0).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        _, tembeds = tc(xt)
        tmask = td(xt, tembeds).numpy().transpose(0, 2, 3, 1)

    cparams = torch_state_to_flax(
        {k: v.numpy() for k, v in tc.state_dict().items()},
        CRITIC_KEYMAP)
    dparams = torch_state_to_flax(
        {k: v.numpy() for k, v in td.state_dict().items()},
        DECODER_KEYMAP)
    xj = jax.numpy.asarray(x)
    _, embeds = Critic().apply({"params": cparams}, xj, collect=True)
    mask = np.asarray(UnetDecoder().apply({"params": dparams}, xj,
                                          embeds))
    for thresh in (0.05, 0.5):  # eval + binarymask defaults
        a = mask > thresh
        b = tmask > thresh
        union = (a | b).sum()
        # identical empty masks are perfect agreement
        iou = (a & b).sum() / union if union else 1.0
        assert iou >= 0.99, f"IoU {iou} at thresh {thresh}"
        assert a.sum() == b.sum()  # same pixel count either way
