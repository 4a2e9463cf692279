"""Golden tests for the pretrained-backbone zoo converters.

The reference's VGGCritic/ResNetCritic (nets.py:704-804) wrap
torchvision backbones. torchvision is not installed in this env, so —
like tests/test_torch_parity.py's TorchCritic — we hand-build torch
replicas of `vgg11().features` (nets.py:753-758) and
`Sequential(*resnet18.children()[0:8])` (nets.py:790-793) with random
weights, convert their state_dicts through
cgs_tpu.models.torch_interop, and assert forward parity. A converter
that round-trips random weights round-trips torchvision's pretrained
ones: the key grammar and layouts are identical.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cgs_tpu.models.torch_interop import (
    resnet18_torch_to_flax, vgg11_torch_to_flax,
)
from cgs_tpu.models.zoo import (
    IMAGENET_MEAN, IMAGENET_STD, ResNetCritic, VGG11Features, VGGCritic,
)

# ---------------------------------------------------------------------
# torch replicas (same layer stacks + state_dict key grammar as the
# reference's torchvision-backed modules)
# ---------------------------------------------------------------------

VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
             512, 512, "M"]


def make_torch_vgg11_features() -> tnn.Sequential:
    """torchvision vgg11().features replica (conv slots at indices
    0,3,6,8,11,13,16,18 like the real one)."""
    layers, in_ch = [], 3
    for v in VGG11_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
            in_ch = v
    return tnn.Sequential(*layers)


class TorchVGGCritic(tnn.Module):
    """nets.py:761-787 with the torchvision backbone swapped for the
    replica; forward = normalize -> features -> head."""

    def __init__(self):
        super().__init__()
        self.features = make_torch_vgg11_features()
        self.head = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(512 * 2 * 2, 256), tnn.ReLU(),
            tnn.Linear(256, 128), tnn.ReLU(), tnn.Linear(128, 1))

    def forward(self, x_nchw):
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        return self.head(self.features((x_nchw - mean) / std))


class TorchBasicBlock(tnn.Module):
    """torchvision resnet BasicBlock replica (conv1/bn1/conv2/bn2 +
    optional downsample Sequential) with the same state_dict keys."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(out + res)


def make_torch_resnet18_features() -> tnn.Sequential:
    """Sequential(*resnet18.children()[0:8]) replica: stem (conv, bn,
    relu, maxpool) + 4 stages of 2 blocks."""
    stages = []
    in_ch = 64
    for stage, out_ch in enumerate((64, 128, 256, 512)):
        blocks = []
        for block in range(2):
            stride = 2 if stage > 0 and block == 0 else 1
            blocks.append(TorchBasicBlock(in_ch, out_ch, stride))
            in_ch = out_ch
        stages.append(tnn.Sequential(*blocks))
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
        tnn.ReLU(), tnn.MaxPool2d(3, 2, 1), *stages)


class TorchResNetCritic(tnn.Module):
    """nets.py:704-730 replica (input already in [0,1])."""

    def __init__(self):
        super().__init__()
        self.resnet = make_torch_resnet18_features()
        self.head = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(512 * 2 * 2, 256), tnn.ReLU(),
            tnn.Linear(256, 1))

    def forward(self, x_nchw):
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        return self.head(self.resnet((x_nchw - mean) / std))


def _randomize_bn_stats(module, gen):
    """Non-trivial running stats so eval-mode BN actually tests the
    mean/var mapping (fresh BN has mean=0, var=1 — a converter that
    drops them would still pass)."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.running_mean.shape[0]
            m.running_mean.copy_(torch.from_numpy(
                gen.normal(0, 0.5, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                gen.uniform(0.5, 2.0, n).astype(np.float32)))


@pytest.fixture
def frames():
    rng = np.random.default_rng(7)
    return rng.random((4, 64, 64, 3), dtype=np.float32)


def _to_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)


def test_vgg_critic_parity(frames):
    """float64 end-to-end: in f32 the 8-deep 512-channel conv stack
    accumulates summation-order noise that the near-zero head output
    amplifies to ~1% relative; in f64 a correct converter matches to
    1e-10 (measured 2e-17 on the features) and a wrong one fails hard.
    enable_x64 is scoped so the rest of the suite stays f32."""
    torch.manual_seed(0)
    tm = TorchVGGCritic().double().eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(frames).permute(
            0, 3, 1, 2).double()).numpy()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    with jax.enable_x64(True):
        params = _to_f64(vgg11_torch_to_flax(state))
        got = np.asarray(VGGCritic().apply(
            {"params": params}, jnp.asarray(frames, jnp.float64)))
    np.testing.assert_allclose(got, want.reshape(got.shape), atol=1e-10)


@pytest.mark.slow  # full VGG11 tower vs torchvision-layout replica (~50 s)
def test_vgg_features_embedder_parity(frames):
    """VGGEmbedder grammar (prefix 'model', no head, nets.py:733-748):
    backbone output + the 64x64-bilinear-resized post-ReLU embeds."""
    torch.manual_seed(1)
    feats = make_torch_vgg11_features().double().eval()
    x = torch.from_numpy(frames).permute(0, 3, 1, 2).double()
    embeds = []
    with torch.no_grad():
        for layer in feats:
            x = layer(x)
            if isinstance(layer, tnn.ReLU):
                embeds.append(F.interpolate(x, size=(64, 64),
                                            mode="bilinear"))
        want_x = x.numpy()
        want_em = torch.cat(embeds, dim=1).numpy()

    state = {f"model.{k}": v.numpy()
             for k, v in feats.state_dict().items()}
    with jax.enable_x64(True):
        params = _to_f64(vgg11_torch_to_flax(
            state, features_prefix="model", head=False))
        got_x, got_em = VGG11Features(collect_embeds=True).apply(
            {"params": params}, jnp.asarray(frames, jnp.float64))
        got_x, got_em = np.asarray(got_x), np.asarray(got_em)
    np.testing.assert_allclose(
        got_x, np.transpose(want_x, (0, 2, 3, 1)), atol=1e-10)
    # the bilinear 64x64 upsample: torch align_corners=False ==
    # jax.image.resize 'bilinear' (half-pixel), but allow interpolation
    # rounding at 1e-8
    np.testing.assert_allclose(
        got_em, np.transpose(want_em, (0, 2, 3, 1)), atol=1e-8)


def test_resnet_critic_parity(frames):
    torch.manual_seed(2)
    tm = TorchResNetCritic().double().eval()
    _randomize_bn_stats(tm, np.random.default_rng(3))
    with torch.no_grad():
        want = tm(torch.from_numpy(frames).permute(
            0, 3, 1, 2).double()).numpy()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    with jax.enable_x64(True):
        params, stats = resnet18_torch_to_flax(state)
        got = np.asarray(ResNetCritic().apply(
            {"params": _to_f64(params), "batch_stats": _to_f64(stats)},
            jnp.asarray(frames, jnp.float64)))
    np.testing.assert_allclose(got, want.reshape(got.shape), atol=1e-9)


def test_resnet_raw_torchvision_grammar(frames):
    """Raw torchvision keys (conv1/bn1/layerN) convert identically to
    the reference's Sequential grammar."""
    torch.manual_seed(2)
    tm = TorchResNetCritic().eval()
    _randomize_bn_stats(tm, np.random.default_rng(3))
    seq_state = {k: v.numpy() for k, v in tm.state_dict().items()}

    raw_state = {}
    idx_to_name = {"0": "conv1", "1": "bn1", "4": "layer1",
                   "5": "layer2", "6": "layer3", "7": "layer4"}
    for k, v in seq_state.items():
        if k.startswith("resnet."):
            _, idx, rest = k.split(".", 2)
            raw_state[f"{idx_to_name[idx]}.{rest}"] = v
        else:
            raw_state[k] = v
    raw_state["fc.weight"] = seq_state["head.1.weight"]  # stray extra
    raw_state["fc.bias"] = seq_state["head.1.bias"]

    p1, s1 = resnet18_torch_to_flax(seq_state, head=False)
    p2, s2 = resnet18_torch_to_flax(raw_state, head=False)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(a, b)


def test_missing_head_raises_helpful_error():
    """head=True on a backbone-only state_dict must fail with a clear
    message (raw torchvision resnet18 carries 'fc', not the critic
    head; a bare vgg11 .features has no head at all)."""
    torch.manual_seed(3)
    feats = make_torch_vgg11_features()
    vgg_state = {f"features.{k}": v.numpy()
                 for k, v in feats.state_dict().items()}
    with pytest.raises(ValueError, match="head=False"):
        vgg11_torch_to_flax(vgg_state)

    res = make_torch_resnet18_features()
    idx_to_name = {"0": "conv1", "1": "bn1", "4": "layer1",
                   "5": "layer2", "6": "layer3", "7": "layer4"}
    raw = {}
    for k, v in res.state_dict().items():
        idx, rest = k.split(".", 1)
        raw[f"{idx_to_name[idx]}.{rest}"] = v.numpy()
    raw["fc.weight"] = np.zeros((1000, 512), np.float32)
    raw["fc.bias"] = np.zeros((1000,), np.float32)
    with pytest.raises(ValueError, match="head=False"):
        resnet18_torch_to_flax(raw)
    params, stats = resnet18_torch_to_flax(raw, head=False)
    assert "fc0" not in params and "Conv_0" in params["resnet"]


def test_flattened_head_infers_resize_geometry():
    """Reference VGGCritic(resize=(128,128)) saves head.1 with input
    width 512*4*4=8192 (nets.py:765-768); the converter must infer the
    4x4 spatial side instead of assuming 2x2."""
    from cgs_tpu.models.torch_interop import _wb_flattened

    rng = np.random.default_rng(11)
    w = rng.standard_normal((256, 512 * 4 * 4)).astype(np.float32)
    b = rng.standard_normal(256).astype(np.float32)
    out = _wb_flattened({"head.1.weight": w, "head.1.bias": b},
                        "head.1", 512)
    assert out["kernel"].shape == (8192, 256)
    # spot-check the permutation: torch input index (c,h,w) ->
    # flax input index (h,w,c)
    c, h, wx = 37, 3, 1
    torch_idx = c * 16 + h * 4 + wx
    flax_idx = h * 4 * 512 + wx * 512 + c
    np.testing.assert_array_equal(out["kernel"][flax_idx],
                                  w[:, torch_idx])
    with pytest.raises(ValueError, match="head geometry"):
        _wb_flattened({"head.1.weight": w[:, :2040],
                       "head.1.bias": b}, "head.1", 512)
