"""Checkpointing.

Two tiers (SURVEY.md §5 "Checkpoint / resume"):

1. **Reference-compatible `.pt` files** — the CLI contract. Filenames
   are the arg fingerprints `critic-<args>.pt` / `masker-<args>.pt`
   under `{name}/saves/` (main.py:86-102), contents are torch
   state_dicts in the reference layout, so checkpoints are exchangeable
   with the upstream in BOTH directions. Missing file => train from
   scratch (load returns False, main.py:141-147).
2. **Orbax full train state** (framework extension) — params +
   optimizer state + step counter + RNG key with async save and
   resume-from-latest, which the reference lacks entirely (it never
   saves optimizer state or step).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from cgs_tpu.models.torch_interop import (
    CRITIC_KEYMAP, DECODER_KEYMAP, save_pt, torch_state_to_flax,
)

KEYMAPS = {"critic": CRITIC_KEYMAP, "masker": DECODER_KEYMAP,
           "sepcrit": CRITIC_KEYMAP}


def checkpoint_paths(cfg) -> Dict[str, str]:
    """Fingerprinted .pt paths in the run's saves/ dir (the reference
    layout, main.py:93-102). THE single source for the path scheme —
    Handler and the serving front must agree or serving silently
    falls back to random weights (the fingerprint falsy-drop quirk
    makes these strings easy to get subtly wrong twice)."""
    base = f"{cfg.name}/saves/"
    return {
        "critic": f"{base}critic-{cfg.critic_fingerprint()}.pt",
        "masker": f"{base}masker-{cfg.masker_fingerprint()}.pt",
        "sepcrit": f"{base}sepcrit-{cfg.critic_fingerprint()}.pt",
    }


def save_model_pt(params: Dict, kind: str, path: str) -> None:
    """Write a reference-layout .pt state_dict (main.py:149-156)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_pt(params, KEYMAPS[kind], path)


def load_model_pt(kind: str, path: str) -> Optional[Dict]:
    """Load a reference-layout .pt; None if the file is missing
    (caller trains from scratch, main.py:141-147)."""
    if not os.path.exists(path):
        return None
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    return jax.tree.map(
        lambda x: jax.numpy.asarray(x),
        torch_state_to_flax({k: v.numpy() for k, v in state.items()},
                            KEYMAPS[kind]))


class OrbaxManager:
    """Full-train-state checkpointing with resume-from-latest."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, key=None) -> None:
        payload = {"state": state}
        if key is not None:
            payload["key"] = key
        self.manager.save(step, args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: Any, key=None) -> Optional[tuple]:
        step = self.latest_step()
        if step is None:
            return None
        payload = {"state": template}
        if key is not None:
            payload["key"] = key
        out = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(payload))
        return step, out["state"], out.get("key")

    def wait(self) -> None:
        self.manager.wait_until_finished()


def params_to_host(params):
    return jax.tree.map(lambda x: np.asarray(x), params)


def load_seed_ensemble(cfg, n: int, base_seed: int = 0):
    """Stacked {critic, masker} params from the n per-seed runs
    `{model}-seed{base_seed..base_seed+n-1}` — the run-name convention
    both sandbox/multirun.py (serial) and sandbox/seed_parallel.py
    (save_checkpoints=True) write; pass base_seed to serve an ensemble
    trained with a non-zero run_parallel base_seed (ADVICE r3: the
    writer stamps {model}-seed{base_seed+r}, so the loader must share
    the offset — `--ensemble N` assumes base_seed 0). Every leaf gains
    a leading (n,) seed axis for MaskPipeline(ensemble=True). Raises
    FileNotFoundError naming the first missing checkpoint (unlike
    single-model loading, an ensemble with silently random members
    would corrupt the mean mask). -separate ensembles are rejected:
    sepcrit is never persisted (the reference quirk, main.py:1554-64).
    """
    import dataclasses

    if getattr(cfg, "separate", False):
        raise ValueError(
            "--ensemble cannot serve -separate runs: the sepcrit the "
            "masker was trained on is never persisted (reference "
            "quirk, main.py:1554-1564)")
    trees = {"critic": [], "masker": []}
    # load + stack on the HOST: load_model_pt materializes on the
    # process default backend (the pinned remote-TPU client here), so
    # without the CPU default_device every member would ship through
    # the tunnel, come back for np.stack, and the stacked tree would
    # ship AGAIN via update_params' device_put
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        for s in range(base_seed, base_seed + n):
            cfg_s = dataclasses.replace(
                cfg, model=f"{cfg.model}-seed{s}").derive()
            paths = checkpoint_paths(cfg_s)
            for name in trees:
                t = load_model_pt(name, paths[name])
                if t is None:
                    raise FileNotFoundError(
                        f"ensemble member missing: {paths[name]}")
                trees[name].append(t)
    return {name: jax.tree.map(
                lambda *a: np.stack([np.asarray(x) for x in a]), *ts)
            for name, ts in trees.items()}
