"""Import the ACTUAL reference source from /root/reference (read-only).

VERDICT r3 item 1: the replica-based parity tests
(test_torch_parity.py, test_training_parity.py) build hand-transcribed
torch models from the nets.py/main.py spec — a transcription error
would be shared by replica and port and never caught. This module makes
the reference itself importable so parity can be pinned against
nets.py:160-212 / nets.py:452-523 / main.py:314-575 *as shipped*.

Environment shims (documented, none alter reference behavior on the
paths we execute):

  * numpy aliases: the reference targets numpy<1.24 and uses np.int /
    np.float / np.bool (nets.py:456-457, main.py:37,121,1251); modern
    numpy removed them, so we restore the plain-builtin aliases (which
    is exactly what they meant).
  * missing packages: `minerl` (main.py:15), `ffmpeg` (main.py:22) and
    `torchvision` (nets.py:5) are not installed here. They are only
    touched by dataset download, video export, and the pretrained-
    backbone zoo — none of which the parity tests run — so empty
    module stubs satisfy the imports (any accidental use raises
    AttributeError loudly).
  * matplotlib is forced to the Agg backend (headless).
  * the hard-coded font `./isy_minerl/segm/etc/Ubuntu-R.ttf`
    (main.py:70) is absent from the reference repo itself (SURVEY.md
    §5); tests monkeypatch PIL.ImageFont.truetype to load_default()
    before constructing Handler.

Nothing here writes to /root/reference; Handler runs are chdir'd into
pytest tmp dirs because the reference builds relative paths
(main.py:93-102).
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"

_cache = {}


def load_reference():
    """Returns (nets, main) — the reference's modules, as shipped."""
    if _cache:
        return _cache["nets"], _cache["main"]

    for name, builtin in (("int", int), ("float", float),
                          ("bool", bool)):
        try:
            getattr(np, name)
        except AttributeError:
            setattr(np, name, builtin)

    for modname in ("minerl", "ffmpeg"):
        if modname not in sys.modules:
            sys.modules[modname] = types.ModuleType(modname)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models

    import matplotlib
    matplotlib.use("Agg", force=True)

    sys.path.insert(0, REFERENCE_DIR)
    try:
        nets = importlib.import_module("nets")
        main = importlib.import_module("main")
    finally:
        sys.path.remove(REFERENCE_DIR)
    _cache["nets"] = nets
    _cache["main"] = main
    return nets, main


def reference_namespace(cfg):
    """Our Config -> an argparse-style namespace for reference
    Handler(args). Config mirrors the reference flag grammar field-for-
    field (core/config.py), so the dataclass dict IS the namespace; the
    framework-only extension fields ride along unread."""
    import argparse
    import dataclasses
    return argparse.Namespace(**dataclasses.asdict(cfg))
