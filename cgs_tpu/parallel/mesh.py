"""Device mesh and sharding layout.

The reference is strictly single-device (SURVEY.md §2.5: CPU-pinned
torch 1.4, `main.py:71`). The TPU build introduces first-class data
parallelism — the one strategy this workload needs (models are ~100k
params on 64x64 frames) — while keeping the mesh 2-D ('data', 'model')
so tensor-parallel sharding annotations have a home if a larger model
family lands later. Only 'data' is populated today; 'model' is size 1
and documented as an explicit non-goal (SURVEY.md §7.4).

Mechanics: batches are sharded over 'data' via NamedSharding; params
are replicated; `jax.jit` over the mesh lets XLA insert the gradient
all-reduce (psum over ICI). No NCCL-style explicit collectives are
needed — that is the point of the design.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. n_data=0 means all devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data <= 0:
        n_data = max(1, len(devices) // n_model)
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs "
            f"{n_data * n_model} devices but only {len(devices)} are "
            "available — lower --data-parallel (or set "
            "XLA_FLAGS=--xla_force_host_platform_device_count for a "
            "virtual CPU mesh)")
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def index_sharding(mesh: Mesh, batch: Optional[int] = None
                   ) -> NamedSharding:
    """Sharding for (steps, batch) index stacks: the scan axis stays
    whole, the batch axis splits over 'data'. The device-resident
    frame banks are replicated; sharding the per-step gather indices
    makes every downstream tensor of the train step batch-sharded, so
    XLA inserts the gradient all-reduce over ICI (the
    replicate-the-bank / shard-the-indices layout).

    With `batch` given, degrade gracefully when the batch axis is not
    divisible by the 'data' extent (e.g. the fixed contrastive k=32
    on a 64-chip mesh): fall back to replicated placement — correct
    math, every chip computes the full batch — instead of a sharding
    error at dispatch."""
    if batch is not None and batch % mesh.shape["data"]:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(None, "data"))


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree over the mesh — THE placement idiom for
    params/state/banks/keys. Single-process: direct device_put (the
    values may be committed local or global arrays). Multi-process:
    route through host numpy first — device_put of a host value onto
    a global sharding is the documented way to build global arrays
    (every process supplies the identical value); a locally-committed
    jax.Array is rejected."""
    if jax.process_count() > 1:
        import numpy as _np
        tree = jax.tree.map(_np.asarray, tree)
    return jax.device_put(tree, replicated_sharding(mesh))


def seed_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-SEED-axis sharding over 'data' — the placement for
    stacked per-seed param trees (ensemble inference, seed-parallel
    training): seed-per-device, every other axis replicated."""
    return NamedSharding(mesh, P("data"))


def seed_shard_tree(mesh: Mesh, tree):
    """Place a stacked per-seed pytree (leading (R,) axis on every
    leaf) seed-sharded over 'data'. Multi-process: route through host
    numpy like replicate_tree (device_put of a host value is the
    documented global-array construction)."""
    if jax.process_count() > 1:
        import numpy as _np
        tree = jax.tree.map(_np.asarray, tree)
    return jax.device_put(tree, seed_sharding(mesh))


_ensemble_warned = set()     # (who, r, ndata) already printed


def ensemble_mesh_or_none(mesh: Optional[Mesh], r: int,
                          who: str = "cgs-tpu") -> Optional[Mesh]:
    """THE eligibility rule for seed-sharded ensemble inference:
    returns `mesh` when the R members divide evenly over the 'data'
    axis, else warns once per (caller, shape) and returns None
    (callers fall back to the single-device vmapped ensemble). One
    site so handler/serve/pipeline cannot drift
    (MaskPipeline.update_params keeps the hard ValueError as the last
    line of defense)."""
    if mesh is None:
        return None
    ndata = mesh.shape["data"]
    if r % ndata:
        key = (who, r, ndata)
        if key not in _ensemble_warned:   # ADVICE r3: repeated
            # _get_pipe cache misses / serve restarts were re-printing
            _ensemble_warned.add(key)
            print(f"[{who}] --ensemble {r} does not divide over the "
                  f"{ndata}-wide 'data' axis — running unmeshed "
                  "(seed-sharding needs N % n_data == 0)")
        return None
    return mesh


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (or pytree of arrays) sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def local_mesh_or_none(cfg) -> Optional[Mesh]:
    """Mesh for the current process given a Config; None for 1 device
    (plain jit is already optimal there)."""
    ndev = len(jax.devices())
    n_data = cfg.data_parallel if cfg.data_parallel > 0 else ndev
    if n_data <= 1:
        return None
    return make_mesh(n_data=n_data)
