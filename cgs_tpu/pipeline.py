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
    copies overlap device compute — bounded to max_in_flight
    outstanding chunks so live outputs never exhaust HBM;
  * host-fed callers can take the mask down-wire as PNG-space uint8
    (+ an in-graph binarization plane) at 1/4 the D2H bytes with
    bit-identical -process outputs (`wire`, `hard_threshold`);
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
    masks: Optional[np.ndarray]  # (N, H, W, 1) f32 soft masks
    #                              (None when wire='u8')
    saliency: Optional[np.ndarray] = None   # (N, H, W, 1) |input-grad|
    masks_u8: Optional[np.ndarray] = None   # (N, H, W, 1) uint8 0..255
    #                              PNG-space quantized soft masks
    #                              (wire='u8' only)
    hard: Optional[np.ndarray] = None       # (N, H, W, 1) uint8 0/1
    #                              in-graph (mask >= hard_threshold)


class MaskPipeline:
    """Critic+masker batched inference with optional saliency.

    Parity notes: `eval_mode=True` disables dropout (reference
    `.eval()`, main.py:900-909); `-noevalmode` maps to
    eval_mode=False, which keeps dropout live exactly like the
    reference's `.train()` inference quirk (main.py:1114-1118).
    """

    MAX_IN_FLIGHT = 3   # run(): outstanding device dispatches

    def __init__(self, critic, masker, params, batch_size: int = 16384,
                 salience: bool = False, eval_mode: bool = True,
                 separate: bool = False, seed: int = 0,
                 with_checksum: bool = False, mesh=None,
                 use_pallas: bool = False, ensemble: bool = False,
                 wire: str = "f32",
                 hard_threshold: Optional[float] = None,
                 max_in_flight: Optional[int] = None,
                 quantize: Optional[str] = None,
                 calib: Optional[np.ndarray] = None):
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

        wire: mask D2H format (VERDICT r3 #4 — on host-fed paths the
        f32 soft-mask transfer dominates, 16 KB/frame):
          * 'f32' (default): soft f32 masks — the parity surface every
            numeric consumer (eval IoU, CRF) reads.
          * 'u8': PNG-space quantized uint8, floor(255*clip(m,0,1)) —
            BIT-IDENTICAL to what the -process PNG writers compute
            from the f32 masks (main.py:1216-1223 `(m*255).astype
            (uint8)` truncates; m>=0 so trunc==floor — we floor
            in-graph so the XLA f32->u8 convert, whose rounding mode
            is not portable, sees an exact integer), at 1/4 the
            transfer. run() then fills `masks_u8` and leaves `masks`
            None.

        hard_threshold: when set, the graph ALSO emits
        (mask >= hard_threshold) as a uint8 0/1 plane (`hard` in the
        output) — the -process binarization (main.py:1164, note >=)
        computed device-side, so a 'u8'-wire caller still gets hard
        masks identical to host-thresholding the f32 masks (the
        quantized mask alone could not reproduce them: floor crosses
        the threshold differently). Ignored by nothing: works with
        any wire.

        quantize: None (default) or 'int8' — post-training int8
        inference (ops/quant.py): conv weights per-channel int8
        (quantized once per update_params), activations per-tensor
        int8 (dynamic, or static via `calib`), convs on the MXU as
        s8 x s8 -> s32. Serving extension (no reference analogue —
        main.py serves f32 torch). Accuracy-validated (hard-mask
        agreement 1.0 vs bf16 on the v5e at chfak=5) but measured
        SLOWER end-to-end there (0.73x dynamic / 0.90x static /
        monotonically worse per quantized conv in the subset sweep,
        RESULTS.md): the isolated 1.52x conv win does not survive
        XLA's requant seams and int8 layout boundaries — keep bf16
        for v5e serving; the path is shipped for accuracy headroom
        studies and future hardware/compiler revisions. Eval-only:
        incompatible with salience (int8 convs carry no useful
        gradient) and with eval_mode=False (live dropout); both
        raise here rather than mis-serve.

        calib: optional (N, H, W, 3) uint8 calibration frames for
        quantize='int8'. When given, activation scales are STATIC
        (baked from the calibration batch's per-conv max|input|, one
        f32 forward per update_params) so the in-graph quantize is a
        pure fused elementwise op; without it scales are DYNAMIC
        (per-dispatch max-reduce per conv input — accuracy-identical
        on in-distribution data but measured 0.73x end-to-end at
        chfak=5, the reduce barrier eats the MXU win). A few hundred
        representative frames suffice; out-of-range activations
        saturate at ±127. Ignored unless quantize='int8'.

        max_in_flight: bound on outstanding run() dispatches (default
        MAX_IN_FLIGHT=3). Unbounded async dispatch would hold every
        chunk's outputs live in HBM at once — ~280 MB/chunk at batch
        16k, RESOURCE_EXHAUSTED on a v5e-1 for ~30-chunk folders
        (VERDICT r3 #3); a window of 3 keeps H2D/compute/D2H
        overlapped while capping live output memory.

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
        if wire not in ("f32", "u8"):
            raise ValueError(f"wire={wire!r} not in ('f32', 'u8')")
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize={quantize!r} not in "
                             "(None, 'int8')")
        if quantize and salience:
            raise ValueError("quantize='int8' cannot compute saliency "
                             "(no useful input gradient through int8 "
                             "convs) — drop one of the two")
        if quantize and not eval_mode:
            raise ValueError("quantize='int8' requires eval_mode=True "
                             "(the quantized forward has no dropout)")
        self.quantize = quantize
        self._calib = calib if quantize else None
        self.separate = separate   # needed by update_params calibration
        self.wire = wire
        self.hard_threshold = (float(hard_threshold)
                               if hard_threshold is not None else None)
        self.max_in_flight = max(1, int(max_in_flight
                                        if max_in_flight is not None
                                        else self.MAX_IN_FLIGHT))
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
        return self._encode_wire(self._make_core_forward())

    def _encode_wire(self, core):
        """Wrap the core forward with the output wire encoding (see
        __init__: wire / hard_threshold). Applied AFTER the ensemble
        mean (a mean of quantized uint8 members would not be the
        quantized mean), before jit, so the threshold compare and the
        floor-quantize fuse into the same program — the f32 mask never
        leaves the device."""
        wire, thr = self.wire, self.hard_threshold
        if wire == "f32" and thr is None:
            return core

        def encoded(params, u8, key):
            out = core(params, u8, key)
            pred, mask, sal = out[0], out[1], out[2]
            rest = tuple(out[3:])        # with_checksum's ck, if any
            extra = ()
            if thr is not None:          # main.py:1164 (>=)
                extra = ((mask >= thr).astype(jnp.uint8),)
            if wire == "u8":
                mask = jnp.floor(
                    jnp.clip(mask, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return (pred, mask, sal) + extra + rest

        return encoded

    def _make_core_forward(self):
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
        quantize = self.quantize
        if quantize == "int8":
            from cgs_tpu.ops.quant import critic_apply_q, masker_apply_q
            cdt = critic.compute_dtype
            mdt = masker.compute_dtype

            def critic_apply(p, xin, k):   # (pred, embeds); k unused:
                # the int8 path is eval-only (guard in __init__)
                return critic_apply_q(p, xin, mode="int8",
                                      compute_dtype=cdt)

            def masker_apply(p, xin, embeds):
                return masker_apply_q(p, xin, embeds, mode="int8",
                                      compute_dtype=mdt)
        else:
            def critic_apply(p, xin, k):
                return critic.apply(
                    {"params": p}, xin, collect=True,
                    deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": k})

            def masker_apply(p, xin, embeds):
                return masker.apply({"params": p}, xin, embeds)

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
                out = critic_apply(params["critic"], xin, ks[0])
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
                _, embeds = critic_apply(params["sepcrit"], x, ks[1])

            mask = masker_apply(params["masker"], x, embeds)
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
        if self.quantize == "int8":
            # one-time: conv kernels -> int8 + per-channel scales; the
            # f32 kernels never reach the device (ops/quant.py). The
            # leading ensemble seed axis passes through (negative-axis
            # reductions), so ensemble + int8 composes
            from cgs_tpu.ops.quant import (calibrate_act_scales,
                                           merge_act_scales,
                                           quantize_tree)
            scales = None
            if self._calib is not None and not self.ensemble:
                # static activation scales from the raw f32 params
                # (the ensemble's per-seed calibration would need a
                # vmapped eager tap — dynamic scales there instead)
                scales = calibrate_act_scales(
                    params, self._calib, separate=self.separate,
                    compute_dtype=self.critic.compute_dtype)
            params = quantize_tree(params)
            if scales is not None:
                params = merge_act_scales(params, scales)
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
        """Host-array path: chunking, padding, async dispatch bounded
        to max_in_flight outstanding chunks. Dispatching every chunk
        before the first readback (the r3 design) holds every chunk's
        outputs live in HBM simultaneously — a 500k-frame folder at
        batch 16k is ~30 chunks x ~280 MB of outputs, RESOURCE_
        EXHAUSTED on a v5e-1 (VERDICT r3 #3). A window of 3 still
        overlaps the next H2D copy and compute with the current D2H
        readback, so throughput is unchanged (bench-verified)."""
        n = frames_u8.shape[0]
        if n == 0:
            h, w = frames_u8.shape[1:3] or (64, 64)
            zmask = np.zeros((0, h, w, 1), np.float32)
            return PipelineOutput(
                preds=np.zeros((0,), np.float32),
                masks=zmask if self.wire == "f32" else None,
                masks_u8=(np.zeros((0, h, w, 1), np.uint8)
                          if self.wire == "u8" else None),
                hard=(np.zeros((0, h, w, 1), np.uint8)
                      if self.hard_threshold is not None else None),
                saliency=np.zeros((0, h, w, 1), np.float32)
                if self.salience else None)
        bs = min(self.batch, n)
        if self.mesh is not None:  # keep shards even
            ndata = self.mesh.shape["data"]
            bs = -(-bs // ndata) * ndata

        with_hard = self.hard_threshold is not None
        preds, masks, sals, hards = [], [], [], []

        def read_back(fut):
            pred, mask, sal = fut[0], fut[1], fut[2]
            preds.append(np.asarray(pred))
            masks.append(np.asarray(mask))
            if sal is not None:
                sals.append(np.asarray(sal))
            if with_hard:
                hards.append(np.asarray(fut[3]))

        pending = []
        for lo in range(0, n, bs):
            chunk = frames_u8[lo:lo + bs]
            if chunk.shape[0] < bs:  # pad final ragged batch
                pad = bs - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)], axis=0)
            # the device_put/asarray starts the H2D copy; dispatch is
            # async, so the next chunk's copy overlaps this compute
            pending.append(self._fn(self.params, self.place_input(chunk),
                                    self._next_key()))
            if len(pending) >= self.max_in_flight:
                read_back(pending.pop(0))
        for fut in pending:
            read_back(fut)

        preds = np.concatenate(preds)[:n]
        mask_all = np.concatenate(masks)[:n]
        sal = np.concatenate(sals)[:n] if sals else None
        hard = np.concatenate(hards)[:n] if hards else None
        if self.wire == "u8":
            return PipelineOutput(preds=preds, masks=None, saliency=sal,
                                  masks_u8=mask_all, hard=hard)
        return PipelineOutput(preds=preds, masks=mask_all, saliency=sal,
                              hard=hard)
