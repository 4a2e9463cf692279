"""Batched mask-inference pipeline (the `-process`/`-eval` forward
path, reference main.py:1130-1151 / 935-956).

Throughput design (north-star: >=100k 64x64 frames/s/chip):
  * ONE jitted program per batch: uint8 ingest (f32/255), critic
    forward with skip collection, masker forward, optional saliency
    (fused value_and_grad), optional thresholding — no intermediate
    host round-trips (the reference crosses host<->device per batch
    and per stage);
  * large fixed batch (default 16384) so dispatch overhead and the
    conv pipeline startup amortize; the final ragged batch is padded
    (static shapes — XLA compiles exactly two programs);
  * inputs are dispatched asynchronously ahead of consumption so H2D
    copies overlap device compute;
  * measured on a v5e-1: ~604k frames/s device-resident at batch 32k
    in bf16 (~306k f32), vs the reference's single-digit-k on CPU
    torch; see RESULTS.md for methodology and the roofline analysis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass
class PipelineOutput:
    preds: np.ndarray          # (N,) critic scores
    masks: np.ndarray          # (N, H, W, 1) soft masks
    saliency: Optional[np.ndarray] = None   # (N, H, W, 1) |input-grad|


class MaskPipeline:
    """Critic+masker batched inference with optional saliency.

    Parity notes: `eval_mode=True` disables dropout (reference
    `.eval()`, main.py:900-909); `-noevalmode` maps to
    eval_mode=False, which keeps dropout live exactly like the
    reference's `.train()` inference quirk (main.py:1114-1118).
    """

    def __init__(self, critic, masker, params, batch_size: int = 16384,
                 salience: bool = False, eval_mode: bool = True,
                 separate: bool = False, seed: int = 0,
                 with_checksum: bool = False, mesh=None,
                 use_pallas: bool = False, ensemble: bool = False):
        """mesh: optional ('data','model') jax Mesh — params are
        replicated and run() shards each batch over 'data', so
        multi-chip inference needs no other change (the committed
        input shardings propagate through the plain jit).

        use_pallas: uint8 ingest via the Pallas normalize_u8 kernel
        (applied only when the computation lands on TPU hardware).
        Off by default on purpose: measured 0.76x the XLA path on v5e
        — XLA fuses the ingest into the first conv, the kernel forces
        an f32 HBM round-trip (see ops/pallas_kernels.py).

        ensemble: params carry a leading seed axis (R models, e.g.
        stacked from seed-parallel/multirun checkpoints); outputs are
        the MEAN over the R per-seed forwards (pred, soft mask, and
        saliency alike — the mean-mask ensemble measured at 0.962 IoU
        with CRF in RESULTS.md). No upstream analogue (framework
        extension).

        ensemble + mesh composes as SEED-SHARDED inference: the seed
        axis shards over 'data' (R % n_data == 0 required), the batch
        replicates, and each device runs a plain local vmap over its
        own members — shard_map, not GSPMD sharding annotations, so
        the partitioner never sees the vmapped VALID conv it
        miscompiles (sandbox/seed_parallel.py:_seed_jit). The only
        collective is one pmean of the already-averaged outputs, so
        per-chip cost == the single-model forward: an R-member
        ensemble on R chips runs at full single-model throughput
        (vs 1/R-ish vmapped on one chip, RESULTS.md)."""
        self.critic = critic
        self.masker = masker
        self.mesh = mesh
        self.ensemble = bool(ensemble)
        platform = (mesh.devices.flat[0].platform if mesh is not None
                    else jax.default_backend())
        self._pallas_ingest = bool(use_pallas) and platform == "tpu"
        self.batch = int(batch_size)
        if mesh is not None:
            from cgs_tpu.parallel.mesh import data_sharding
            self._data_sh = data_sharding(mesh)
            ndata = mesh.shape["data"]
            self.batch = -(-self.batch // ndata) * ndata
        self.update_params(params)
        self.salience = salience
        self.eval_mode = eval_mode
        self.separate = separate
        self.with_checksum = with_checksum
        self._key = jax.random.PRNGKey(seed)
        if mesh is not None:
            from cgs_tpu.parallel.mesh import replicated_sharding
            self._key = jax.device_put(np.asarray(self._key),
                                       replicated_sharding(mesh))
            if jax.process_count() > 1 and not self.ensemble:
                # outputs must come home to every host for the
                # numpy post-processing (CRF, IoU, PNG/video) — a
                # cross-process data-sharded array is not fetchable;
                # replicating the outputs inserts the all-gather
                # (the seed-sharded ensemble path needs no
                # out_shardings: its shard_map out_specs are P()
                # already)
                self._fn = jax.jit(
                    self._make_forward(),
                    out_shardings=replicated_sharding(mesh))
                return
        self._fn = jax.jit(self._make_forward())

    def _make_forward(self):
        single = self._make_single_forward()
        if not self.ensemble:
            return single

        def vmapped(params, u8, key):
            # one key per seed; deterministic (eval_mode) forwards
            # never consume them
            n_seeds = jax.tree.leaves(params)[0].shape[0]
            keys = jax.random.split(key, n_seeds)
            outs = jax.vmap(lambda p, k: single(p, u8, k))(params, keys)
            # mean over the seed axis; None (no saliency) passes
            # through jax.tree.map untouched
            return jax.tree.map(lambda a: jnp.mean(a, axis=0), outs)

        if self.mesh is None:
            return vmapped

        # seed-sharded ensemble (seed-per-device): shard_map so each
        # device vmaps only its local members and the GSPMD
        # partitioner never touches the vmapped VALID conv it
        # miscompiles (sandbox/seed_parallel.py:_seed_jit). The batch
        # replicates; the single collective is the pmean of the
        # local means (equal-sized shards => pmean of local means ==
        # global mean).
        try:
            from jax import shard_map
        except ImportError:                        # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def local_forward(params, u8, key):
            n_local = jax.tree.leaves(params)[0].shape[0]
            # distinct dropout streams per shard (-noevalmode only;
            # eval_mode never consumes them). Deviation vs the
            # unmeshed vmap path's split(key, R) draw order —
            # deterministic eval (the production default) is
            # placement-invariant
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            keys = jax.random.split(key, n_local)
            outs = jax.vmap(lambda p, k: single(p, u8, k))(params, keys)
            outs = jax.tree.map(lambda a: jnp.mean(a, axis=0), outs)
            return jax.tree.map(
                lambda a: jax.lax.pmean(a, "data"), outs)

        return shard_map(local_forward, mesh=self.mesh,
                         in_specs=(P("data"), P(), P()),
                         out_specs=P())

    def _make_single_forward(self):
        critic, masker = self.critic, self.masker
        deterministic = self.eval_mode
        salience = self.salience
        separate = self.separate
        with_checksum = self.with_checksum  # snapshot like the other
        # flags: mutating the attribute post-trace would be silently
        # ignored by the compiled program

        pallas_ingest = self._pallas_ingest

        def forward(params, u8, key):
            if pallas_ingest:
                from cgs_tpu.ops.pallas_kernels import normalize_u8
                n = u8.shape[0]
                # interpret=False explicitly: _pallas_ingest already
                # established the computation lands on TPU hardware;
                # normalize_u8's own default keys off
                # jax.default_backend(), which can be 'cpu' while an
                # explicit TPU mesh runs this program (CLAUDE.md
                # coexistence pattern) — that would silently swap in
                # the lax-op emulation
                x = normalize_u8(u8.reshape(n, -1),
                                 interpret=False).reshape(u8.shape)
            else:
                x = u8.astype(jnp.float32) * (1.0 / 255.0)
            ks = jax.random.split(key, 3)

            def critic_mean(xin):
                out = critic.apply(
                    {"params": params["critic"]}, xin, collect=True,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": ks[0]})
                return jnp.mean(out[0]), out

            if salience:
                # fused forward+input-grad (main.py:949-953)
                (_, (pred, embeds)), grad = jax.value_and_grad(
                    critic_mean, has_aux=True)(x)
                sal = jnp.sum(jnp.abs(grad), axis=-1, keepdims=True)
            else:
                _, (pred, embeds) = critic_mean(x)
                sal = None

            if separate:  # masker reads sepcrit features (main.py:946-947)
                _, embeds = critic.apply(
                    {"params": params["sepcrit"]}, x, collect=True,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": ks[1]})

            mask = masker.apply({"params": params["masker"]}, x, embeds)
            pred = pred.squeeze(-1)
            if with_checksum:
                # in-graph sync token: a scalar whose readback forces
                # full materialization (bench plumbing, zero extra
                # dispatches)
                ck = jnp.sum(mask) + jnp.sum(pred)
                return pred, mask, sal, ck
            return pred, mask, sal

        return forward

    def update_params(self, params) -> None:
        """Swap in new params without retracing (params are a jit
        argument) — lets callers reuse one compiled pipeline across
        training epochs. Placement rules live in
        parallel/mesh.py:replicate_tree. The no-mesh branch device_puts
        once too: leaving .pt-loaded host numpy in self.params would
        re-upload the whole tree on EVERY dispatch (painful through
        remote-TPU links)."""
        if self.mesh is not None:
            if self.ensemble:
                from cgs_tpu.parallel.mesh import seed_shard_tree
                r = jax.tree.leaves(params)[0].shape[0]
                ndata = self.mesh.shape["data"]
                if r % ndata:
                    raise ValueError(
                        f"seed-sharded ensemble needs R % n_data == 0 "
                        f"(R={r} members over a {ndata}-wide 'data' "
                        "axis) — drop the mesh to run the ensemble "
                        "vmapped on one device")
                params = seed_shard_tree(self.mesh, params)
            else:
                from cgs_tpu.parallel.mesh import replicate_tree
                params = replicate_tree(self.mesh, params)
        else:
            params = jax.device_put(params)
        self.params = params

    def _next_key(self):
        # dropout keys are only consumed with eval_mode=False
        # (-noevalmode); in eval mode skip the per-dispatch split
        if self.eval_mode:
            return self._key
        self._key, k = jax.random.split(self._key)
        return k

    def place_input(self, frames_u8: np.ndarray) -> Array:
        """Host frames -> device array with the pipeline's input
        placement (data-sharded over the mesh when meshed; REPLICATED
        for the seed-sharded ensemble, whose parallel axis is the
        seed, not the batch; plain device array otherwise). Starts the
        H2D copy asynchronously."""
        if self.mesh is not None:
            if self.ensemble:
                from cgs_tpu.parallel.mesh import replicated_sharding
                return jax.device_put(frames_u8,
                                      replicated_sharding(self.mesh))
            return jax.device_put(frames_u8, self._data_sh)
        return jnp.asarray(frames_u8)

    def run_device(self, frames_u8: Array) -> tuple:
        """Device-resident fast path: frames already on device, output
        stays on device. frames_u8: (N, H, W, 3) uint8, N multiple of
        batch not required (single dispatch)."""
        return self._fn(self.params, frames_u8, self._next_key())

    def run(self, frames_u8: np.ndarray) -> PipelineOutput:
        """Host-array path with chunking, padding, and async dispatch."""
        n = frames_u8.shape[0]
        if n == 0:
            h, w = frames_u8.shape[1:3] or (64, 64)
            return PipelineOutput(
                preds=np.zeros((0,), np.float32),
                masks=np.zeros((0, h, w, 1), np.float32),
                saliency=np.zeros((0, h, w, 1), np.float32)
                if self.salience else None)
        bs = min(self.batch, n)
        if self.mesh is not None:  # keep shards even
            ndata = self.mesh.shape["data"]
            bs = -(-bs // ndata) * ndata
        futures = []
        for lo in range(0, n, bs):
            chunk = frames_u8[lo:lo + bs]
            if chunk.shape[0] < bs:  # pad final ragged batch
                pad = bs - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)], axis=0)
            # the device_put/asarray starts the H2D copy; dispatch is
            # async, so the next chunk's copy overlaps this compute
            futures.append(self._fn(self.params, self.place_input(chunk),
                                    self._next_key()))

        preds, masks, sals = [], [], []
        for pred, mask, sal in (f[:3] for f in futures):
            preds.append(np.asarray(pred))
            masks.append(np.asarray(mask))
            if sal is not None:
                sals.append(np.asarray(sal))
        preds = np.concatenate(preds)[:n]
        masks = np.concatenate(masks)[:n]
        sal = np.concatenate(sals)[:n] if sals else None
        return PipelineOutput(preds=preds, masks=masks, saliency=sal)
