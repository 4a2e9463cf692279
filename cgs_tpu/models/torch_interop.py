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
    """Save flax params as a reference-layout .pt state_dict."""
    import torch
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch_state(params, keymap).items()}
    torch.save(state, path)
