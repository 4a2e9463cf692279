"""PyTorch `.pt` checkpoint interop.

The reference saves `state_dict()` blobs via torch.save keyed by an
arg fingerprint (main.py:136-156). We convert those to/from the flax
param trees so (a) users can bring reference-trained weights, and
(b) the numerical-parity test suite can assert forward deltas
(SURVEY.md §4 item 2).

Key maps (reference nn.Sequential indices):
  NewCritic (nets.py:169-195):
    features.{0,3,6,10,14} = conv0..3, conv_neck
    crit.{1,4}             = fc0, fc1
  UnetDecoder (nets.py:479-492):
    dec_model.{0..4} = dec0..dec4 (registered via the Sequential wrap,
    nets.py:486), masker.{0,2} = mask0, mask1

Weight layout: torch conv (out, in, kh, kw) <-> flax (kh, kw, in, out);
torch linear (out, in) <-> flax (in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

CRITIC_KEYMAP = {
    "conv0": "features.0",
    "conv1": "features.3",
    "conv2": "features.6",
    "conv3": "features.10",
    "conv_neck": "features.14",
    "fc0": "crit.1",
    "fc1": "crit.4",
}

DECODER_KEYMAP = {
    "dec0": "dec_model.0",
    "dec1": "dec_model.1",
    "dec2": "dec_model.2",
    "dec3": "dec_model.3",
    "dec4": "dec_model.4",
    "mask0": "masker.0",
    "mask1": "masker.2",
}


def _to_flax_w(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:     # conv
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w)  # linear


def _to_torch_w(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:
        return np.transpose(w, (3, 2, 0, 1))
    return np.transpose(w)


def torch_state_to_flax(state: Dict[str, "np.ndarray"],
                        keymap: Dict[str, str]) -> Dict:
    """torch state_dict (tensors or ndarrays) -> flax params dict.

    Arrays are COPIED: `tensor.numpy()` aliases torch parameter
    storage, and torch optimizers update parameters in place — a view
    here would silently track future training steps."""
    out = {}
    for flax_name, torch_name in keymap.items():
        w = np.array(state[f"{torch_name}.weight"], copy=True)
        b = np.array(state[f"{torch_name}.bias"], copy=True)
        out[flax_name] = {"kernel": _to_flax_w(w), "bias": b}
    return out


def flax_to_torch_state(params: Dict, keymap: Dict[str, str]) -> Dict:
    """flax params dict -> torch-layout state_dict of numpy arrays."""
    out = {}
    for flax_name, torch_name in keymap.items():
        leaf = params[flax_name]
        out[f"{torch_name}.weight"] = _to_torch_w(np.asarray(leaf["kernel"]))
        out[f"{torch_name}.bias"] = np.asarray(leaf["bias"])
    return out


def load_pt_critic(path: str) -> Dict:
    """Load a reference critic .pt into flax params."""
    import torch
    state = torch.load(path, map_location="cpu")
    return torch_state_to_flax(
        {k: v.numpy() for k, v in state.items()}, CRITIC_KEYMAP)


def load_pt_masker(path: str) -> Dict:
    import torch
    state = torch.load(path, map_location="cpu")
    return torch_state_to_flax(
        {k: v.numpy() for k, v in state.items()}, DECODER_KEYMAP)


def save_pt(params: Dict, keymap: Dict[str, str], path: str) -> None:
    """Save flax params as a reference-layout .pt state_dict.

    Atomic publish (tmp + os.replace): training overwrites the same
    fingerprinted filename every --saveevery epochs (main.py:228,565)
    while a co-located server may be mid-`/reload` — a direct
    torch.save would let the reader see a truncated zip."""
    import os

    import torch
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch_state(params, keymap).items()}
    tmp = f"{path}.tmp.{os.getpid()}"
    torch.save(state, tmp)
    os.replace(tmp, path)


# ---------------------------------------------------------------------
# pretrained-backbone zoo converters (reference nets.py:704-804)
#
# The reference's VGGCritic/ResNetCritic/VGGEmbedder wrap torchvision
# backbones (`visionmodels.vgg11(pretrained=True).features`,
# nets.py:754; `Sequential(*resnet18.children()[0:8])`, nets.py:791),
# so their state_dicts use Sequential-index key grammars. These
# converters load such state_dicts (or raw torchvision ones) into the
# flax modules in cgs_tpu/models/zoo.py. Golden-tested against
# hand-built torch replicas in tests/test_zoo_interop.py (torchvision
# is not installed in this env; torch is).
# ---------------------------------------------------------------------

# conv slots inside torchvision vgg11 `.features` (the other slots are
# ReLU/MaxPool): flax zoo.VGG11Features names them conv0..conv7
VGG11_FEATURE_CONV_IDX = (0, 3, 6, 8, 11, 13, 16, 18)


def _wb(state: Dict, prefix: str) -> Dict:
    """One torch weight+bias slot -> flax {'kernel','bias'} (copied)."""
    w = np.array(state[f"{prefix}.weight"], copy=True)
    return {"kernel": _to_flax_w(w),
            "bias": np.array(state[f"{prefix}.bias"], copy=True)}


def _wb_flattened(state: Dict, prefix: str, channels: int) -> Dict:
    """Dense slot that consumes a FLATTENED feature map: torch
    flattens NCHW (input index c*H*W + h*W + w), flax flattens NHWC
    (h*W*C + w*C + c) — permute the weight's input axis accordingly.
    (No-op only when H=W=1, e.g. the production critic's bottleneck.)

    The spatial side is inferred from the weight's input width, so
    checkpoints saved at non-default resize (reference VGGCritic's
    `resize` arg scales the flatten to 512*(2*fak)^2, nets.py:765-768)
    convert correctly."""
    wt = np.array(state[f"{prefix}.weight"], copy=True)  # (out, c*h*w)
    hw, rem = divmod(wt.shape[1], channels)
    side = int(round(hw ** 0.5))
    if rem or side * side != hw:
        raise ValueError(
            f"{prefix}.weight input width {wt.shape[1]} is not "
            f"{channels} x side^2 — unexpected head geometry")
    wt = wt.reshape(wt.shape[0], channels, side, side)
    wt = wt.transpose(0, 2, 3, 1).reshape(wt.shape[0], hw * channels)
    return {"kernel": np.transpose(wt),
            "bias": np.array(state[f"{prefix}.bias"], copy=True)}


def vgg11_torch_to_flax(state: Dict, features_prefix: str = "features",
                        head: bool = True) -> Dict:
    """VGGCritic state_dict (nets.py:761-787) -> zoo.VGGCritic params.

    features_prefix: 'features' for VGGCritic, 'model' for VGGEmbedder
    (nets.py:733-735). head=False converts the backbone only (for
    VGG11Features / VGGEmbedder, which have no head)."""
    feats = {f"conv{li}": _wb(state, f"{features_prefix}.{ti}")
             for li, ti in enumerate(VGG11_FEATURE_CONV_IDX)}
    if not head:
        return feats
    if "head.1.weight" not in state:
        raise ValueError(
            "state_dict has no VGGCritic head ('head.1.*' missing — "
            "a bare vgg11 .features dict has none): pass head=False "
            "to convert the backbone alone")
    params = {"features": feats}
    # head Sequential [Flatten, Linear, ReLU, Linear, ReLU, Linear]
    # (nets.py:766-772) -> parametered slots 1, 3, 5; fc0 eats the
    # flattened 512-channel feature map, so its input axis is permuted
    params["fc0"] = _wb_flattened(state, "head.1", 512)
    params["fc1"] = _wb(state, "head.3")
    params["fc2"] = _wb(state, "head.5")
    return params


def _bn(state: Dict, prefix: str):
    """torch BatchNorm2d slot -> (flax params, flax batch_stats)."""
    g = lambda k: np.array(state[f"{prefix}.{k}"], copy=True)
    return ({"scale": g("weight"), "bias": g("bias")},
            {"mean": g("running_mean"), "var": g("running_var")})


def _conv_nobias(state: Dict, prefix: str) -> Dict:
    w = np.array(state[f"{prefix}.weight"], copy=True)
    return {"kernel": _to_flax_w(w)}


def resnet18_torch_to_flax(state: Dict, head: bool = True):
    """ResNetCritic state_dict (nets.py:704-730) ->
    (params, batch_stats) for zoo.ResNetCritic.

    Accepts either the reference's Sequential grammar
    ('resnet.0.weight', 'resnet.4.0.conv1.weight', ...; the critic
    wraps children()[0:8] in an nn.Sequential, nets.py:790-793) or a
    raw torchvision resnet18 state_dict ('conv1.weight',
    'layer1.0.conv1.weight', ...), which is renamed first."""
    if "conv1.weight" in state:  # raw torchvision grammar
        renames = {"conv1": "resnet.0", "bn1": "resnet.1"}
        for stage in range(4):
            renames[f"layer{stage + 1}"] = f"resnet.{4 + stage}"
        renamed = {}
        for k, v in state.items():
            top = k.split(".", 1)[0]
            if top in renames:
                renamed[renames[top] + k[len(top):]] = v
            else:
                renamed[k] = v
        state = renamed

    params: Dict = {"resnet": {}}
    stats: Dict = {"resnet": {}}
    params["resnet"]["Conv_0"] = _conv_nobias(state, "resnet.0")
    p, s = _bn(state, "resnet.1")
    params["resnet"]["BatchNorm_0"] = p
    stats["resnet"]["BatchNorm_0"] = s
    # children()[4:8] = layer1..layer4, 2 BasicBlocks each; flax names
    # them ResNetBlock_0..7 in traversal order
    for stage in range(4):
        for block in range(2):
            tp = f"resnet.{4 + stage}.{block}"
            fb = f"ResNetBlock_{stage * 2 + block}"
            bp: Dict = {}
            bs: Dict = {}
            bp["Conv_0"] = _conv_nobias(state, f"{tp}.conv1")
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(state, f"{tp}.bn1")
            bp["Conv_1"] = _conv_nobias(state, f"{tp}.conv2")
            bp["BatchNorm_1"], bs["BatchNorm_1"] = _bn(state, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in state:
                bp["Conv_2"] = _conv_nobias(state, f"{tp}.downsample.0")
                bp["BatchNorm_2"], bs["BatchNorm_2"] = _bn(
                    state, f"{tp}.downsample.1")
            params["resnet"][fb] = bp
            stats["resnet"][fb] = bs
    if head:
        if "head.1.weight" not in state:
            raise ValueError(
                "state_dict has no ResNetCritic head ('head.1.*' "
                "missing — a raw torchvision resnet18 carries only "
                "its 1000-class 'fc' instead): pass head=False to "
                "convert the backbone alone")
        # head Sequential [Flatten, Linear, ReLU, Linear]
        # (nets.py:711-716) -> parametered slots 1, 3; fc0 eats the
        # flattened 512-channel map (NCHW vs NHWC flatten order)
        params["fc0"] = _wb_flattened(state, "head.1", 512)
        params["fc1"] = _wb(state, "head.3")
    return params, stats


def load_pt_vgg_critic(path: str) -> Dict:
    """Load a reference VGGCritic .pt into zoo.VGGCritic params."""
    import torch
    state = torch.load(path, map_location="cpu")
    return vgg11_torch_to_flax(
        {k: v.numpy() for k, v in state.items()})


def load_pt_resnet_critic(path: str, head: bool = True):
    """Load a reference ResNetCritic .pt ->
    {'params': ..., 'batch_stats': ...} for zoo.ResNetCritic.apply.
    head=False converts backbone-only blobs (e.g. a raw torchvision
    resnet18 .pt, whose 1000-class 'fc' is not the critic head)."""
    import torch
    state = torch.load(path, map_location="cpu")
    params, stats = resnet18_torch_to_flax(
        {k: v.numpy() for k, v in state.items()}, head=head)
    return {"params": params, "batch_stats": stats}
