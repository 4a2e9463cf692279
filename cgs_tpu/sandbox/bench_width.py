"""Width-sweep benchmark: the headline kernels at arbitrary --chfak.

Every performance number in RESULTS.md rounds 1-4 was measured at the
chfak=1 CODE default (8/8/8/16-channel encoder, 11.9k-param critic,
nets.py:161). The PAPER's published architecture is chfak=5 — encoder
"40, 40, 40, 80 and 160 channels" with 0.5 dropout
(/root/reference/docs/index.html, Architecture; the multiplier enters
at nets.py:161,166,184,190) — so the kernel verdicts derived at width
1 ("bf16 training is a wash", "fused-pair masker step wins 1.27x")
need re-measuring at the width the paper reports (VERDICT r4 #1a).

Usage (on the real TPU):

    python -m cgs_tpu.sandbox.bench_width --chfak 5 --dropout 0.5
    python -m cgs_tpu.sandbox.bench_width --chfak 1 --dropout 0.3

Prints one JSON line per measurement (inference f32/bf16, critic
chunk f32/bf16, masker chunk f32/bf16 x fuse modes), then a summary
line. Methodology matches bench.py: device-generated data, pipelined
dispatches synced by one readback, persistent compile cache.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _cache():
    import jax
    try:
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _models(chfak: int, dropout: float, dtype,
            pallas_upsample=None):
    from cgs_tpu.models.critic import Critic
    from cgs_tpu.models.decoder import UnetDecoder
    critic = Critic(chfak=chfak, dropout=dropout, compute_dtype=dtype)
    masker = UnetDecoder(chfak=chfak, compute_dtype=dtype,
                         use_pallas_upsample=pallas_upsample)
    return critic, masker


def _init_params(critic, masker):
    """Host-CPU init (CLAUDE.md gotcha: remote-compiling throwaway init
    programs through the TPU tunnel costs ~45 s for nothing). The
    persistent compile cache is suspended around the CPU block —
    caching the tiny init programs replays XLA:CPU AOT blobs on later
    runs, spewing machine-feature-mismatch warnings (bench.py has the
    same ordering rule)."""
    import jax
    import jax.numpy as jnp
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            key = jax.random.PRNGKey(0)
            x0 = jnp.zeros((8, 64, 64, 3))
            cp = critic.init({"params": key}, x0,
                             collect=True)["params"]
            _, em = critic.apply({"params": cp}, x0, collect=True)
            mp = masker.init({"params": key}, x0, em)["params"]
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
    return (jax.tree.map(np.asarray, cp), jax.tree.map(np.asarray, mp))


def bench_inference(chfak: int, dropout: float, batch: int,
                    n_iter: int, bf16: bool,
                    pallas_upsample=None, quantize=None,
                    calibrated=False) -> dict:
    """Device-resident -process throughput (bench.py methodology:
    median of 3 groups of n_iter async dispatches, checksum sync).
    pallas_upsample: None = decoder auto (off on TPU), True/False
    forces the ops/pallas_upsample.py path — the width-1 "Pallas
    upsample loses at the layout seam" verdict re-check.
    quantize: None or 'int8' — the ops/quant.py serving path (the
    1.52x isolated-conv probe, measured end-to-end here);
    calibrated=True bakes static activation scales from a 512-frame
    batch (else dynamic per-dispatch scales)."""
    import jax
    import jax.numpy as jnp
    from cgs_tpu.pipeline import MaskPipeline

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    critic, masker = _models(chfak, dropout, dtype,
                             pallas_upsample=pallas_upsample)
    cp, mp = _init_params(critic, masker)
    calib = None
    if quantize and calibrated:
        calib = np.random.default_rng(2).integers(
            0, 256, (512, 64, 64, 3), dtype=np.uint8)
    pipe = MaskPipeline(critic, masker, {"critic": cp, "masker": mp},
                        batch_size=batch, with_checksum=True,
                        quantize=quantize, calib=calib)
    frames = jax.jit(
        lambda k: jax.random.randint(k, (batch, 64, 64, 3), 0, 256,
                                     dtype=jnp.uint8)
    )(jax.random.PRNGKey(0))
    for _ in range(2):                       # compile + warm
        *_, ck = pipe.run_device(frames)
        float(ck)
    times = []
    for _ in range(3):
        t0 = time.time()
        cks = []
        for _ in range(n_iter):
            *_, ck = pipe.run_device(frames)
            cks.append(ck)
        float(sum(cks))
        times.append((time.time() - t0) / n_iter)
    dt = sorted(times)[1]
    out = {"metric": "process_fps", "chfak": chfak,
           "dtype": "bf16" if bf16 else "f32", "batch": batch,
           "value": round(batch / dt, 1),
           "ms_per_dispatch": round(dt * 1e3, 2)}
    if pallas_upsample is not None:
        out["pallas_upsample"] = bool(pallas_upsample)
    if quantize is not None:
        out["quantize"] = quantize
        out["act_scales"] = "static" if calibrated else "dynamic"
    return out


def bench_training(chfak: int, dropout: float, bf16: bool,
                   fuse: str = "both", steps: int = 100,
                   rounds: int = 6, phases=("critic", "masker"),
                   ) -> list:
    """Critic/masker scanned-chunk steps/s at reference batch shapes
    (critic batch 64; masker K=32 -> 64+64), pipelined dispatches."""
    import jax
    import jax.numpy as jnp
    from cgs_tpu.core.config import Config
    from cgs_tpu.train.loops import make_critic_chunk, make_masker_chunk
    from cgs_tpu.train.steps import (
        init_train_state, make_optimizer, trained_param_keys,
    )

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    cfg = Config(shift=12, dropout=dropout, chfak=chfak,
                 inject=True).derive()
    critic, masker = _models(chfak, dropout, dtype)
    cp, mp = _init_params(critic, masker)
    rng = np.random.default_rng(1)
    kb = jax.random.PRNGKey(7)
    x_all = jax.jit(
        lambda k: jax.random.randint(k, (1024, 64, 64, 3), 0, 256,
                                     dtype=jnp.uint8))(kb)
    y_all = jax.jit(
        lambda k: jax.random.uniform(k, (1024,), jnp.float32))(kb)

    def time_chunk(chunk, state, *args):
        key = jax.random.PRNGKey(0)
        state, losses = chunk(state, *args, key)   # compile + warm
        np.asarray(losses)
        t0 = time.time()
        for _ in range(rounds):
            state, losses = chunk(state, *args, key)
        np.asarray(losses)                          # hard sync
        return rounds * steps / (time.time() - t0)

    out = []
    tag = {"chfak": chfak, "dtype": "bf16" if bf16 else "f32"}
    if "critic" in phases:
        tx = make_optimizer()
        cstate = init_train_state({"critic": cp}, tx, ["critic"])
        chunk = make_critic_chunk(cfg, critic, tx)
        idx = jnp.asarray(rng.integers(0, 1024, (steps, 64),
                                       dtype=np.int32))
        out.append({"metric": "critic_train_steps_per_sec", **tag,
                    "value": round(
                        time_chunk(chunk, cstate, x_all, y_all, idx),
                        3)})
        print(json.dumps(out[-1]), flush=True)
    if "masker" in phases:
        tx2 = make_optimizer()
        mstate = init_train_state({"critic": cp, "masker": mp}, tx2,
                                  trained_param_keys(cfg))
        mchunk = make_masker_chunk(cfg, critic, masker, tx2, fuse=fuse)
        xpos, xneg = x_all[:512], x_all[512:]
        ypos, yneg = y_all[:512], y_all[512:]
        h = jnp.asarray(rng.integers(0, 512, (steps, 32), np.int32))
        l = jnp.asarray(rng.integers(0, 512, (steps, 32), np.int32))
        c = jnp.asarray(rng.integers(0, 512, (steps, 64), np.int32))
        out.append({"metric": "masker_train_steps_per_sec", **tag,
                    "fuse": fuse,
                    "value": round(
                        time_chunk(mchunk, mstate, xpos, ypos, xneg,
                                   yneg, h, l, c), 3)})
        print(json.dumps(out[-1]), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="bench_width")
    p.add_argument("--chfak", type=int, default=5)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=0,
                   help="inference batch (0 = auto: 32768/chfak-scaled)")
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--skip-inference", action="store_true")
    p.add_argument("--skip-training", action="store_true")
    p.add_argument("--fuse-sweep", action="store_true",
                   help="masker chunk at fuse=none/merges/both "
                        "(the 1.27x fused-pair verdict re-check)")
    p.add_argument("--pallas-upsample-ab", action="store_true",
                   help="inference with the Pallas x2 upsample forced "
                        "on AND off (the width-1 layout-seam loss "
                        "re-check)")
    p.add_argument("--int8-ab", action="store_true",
                   help="bf16 vs int8-quantized inference, "
                        "interleaved trials (ops/quant.py end-to-end)")
    a = p.parse_args(argv)
    _cache()

    # auto batch: decoder activations scale ~chfak; 32768 is the
    # chfak=1 plateau and the HBM edge (RESULTS.md batch sweep)
    batch = a.batch or max(2048, 32768 // max(a.chfak, 1))
    results = []
    if not a.skip_inference:
        for bf16 in (False, True):
            r = bench_inference(a.chfak, a.dropout, batch, a.iters,
                                bf16)
            results.append(r)
            print(json.dumps(r), flush=True)
    if a.pallas_upsample_ab:
        for forced in (False, True):
            r = bench_inference(a.chfak, a.dropout, batch, a.iters,
                                True, pallas_upsample=forced)
            results.append(r)
            print(json.dumps(r), flush=True)
    if a.int8_ab:
        for q, cal in ((None, False), ("int8", False), ("int8", True)):
            r = bench_inference(a.chfak, a.dropout, batch, a.iters,
                                True, quantize=q, calibrated=cal)
            results.append(r)
            print(json.dumps(r), flush=True)
    if not a.skip_training:
        for bf16 in (False, True):
            results += bench_training(a.chfak, a.dropout, bf16)
        if a.fuse_sweep:
            for fuse in ("none", "merges"):
                results += bench_training(a.chfak, a.dropout, False,
                                          fuse=fuse,
                                          phases=("masker",))
    print(json.dumps({"metric": "width_bench_done", "chfak": a.chfak,
                      "n": len(results)}), flush=True)
    return results


if __name__ == "__main__":
    main()
