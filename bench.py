#!/usr/bin/env python
"""Headline benchmark: `-process` mask-inference throughput
(64x64 frames/s/chip) on the flagship critic+masker pipeline.

Methodology: frames device-resident (on real deployments H2D of 12KB
frames is negligible; this harness's TPU tunnel caps host transfers at
~22 MB/s, which would measure the tunnel, not the chip), N timed
dispatches of a fixed large batch, synced by a scalar checksum
readback. Baseline = the BASELINE.json north-star of 100k frames/s
(the reference publishes no throughput at all — its pipeline is
single-device CPU torch, reference main.py:71, requirements.txt:79).

Driver-proofing (round-2 postmortem, VERDICT.md "what's weak" #1):
  * the headline JSON line is printed IMMEDIATELY after the
    device-resident timing — nothing slow runs before it;
  * everything else (training steps/s, host-fed path) runs AFTER,
    each stage gated on a wall-clock budget (CGS_BENCH_BUDGET_S,
    default 480 s) so remote-compile variance (2-480 s/program
    through the tunnel) can never eat the already-measured number;
  * a persistent compilation cache (.jax_cache/) makes the driver's
    repeat runs skip the remote compiles entirely;
  * if the extras complete, a SECOND JSON line — the same headline
    keys plus the extra metrics — is printed, so a first-line or a
    last-line parser both see the headline value.
"""

import json
import os
import sys
import time

import numpy as np

T0 = time.time()
BUDGET_S = float(os.environ.get("CGS_BENCH_BUDGET_S", "480"))


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from cgs_tpu import Critic, UnetDecoder
    from cgs_tpu.pipeline import MaskPipeline

    # bf16 conv stacks: 2x the f32 throughput on v5e; hard-mask IoU
    # vs the f32 path measured 1.0 at the 0.05 eval threshold
    critic = Critic(compute_dtype=jnp.bfloat16)
    masker = UnetDecoder(compute_dtype=jnp.bfloat16)
    # init (incl. the PRNG seed program) on the host CPU backend:
    # remote-compiling throwaway init programs through a TPU tunnel
    # costs ~45 s for nothing (CLAUDE.md gotcha; MaskPipeline
    # device_puts the params anyway)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((8, 64, 64, 3))
        cp = critic.init({"params": key}, x0, collect=True)["params"]
        _, em = critic.apply({"params": cp}, x0, collect=True)
        mp = masker.init({"params": key}, x0, em)["params"]

    # persistent compile cache, enabled AFTER the host-CPU init block:
    # the tunneled backend re-compiles remotely (2-480 s per program),
    # so cache hits make driver re-runs near-instant on the compile
    # side — but caching the tiny CPU init programs would replay
    # XLA:CPU AOT blobs on later runs, spewing ~400 KB of
    # machine-feature-mismatch warnings that can push the headline
    # JSON out of the driver's captured tail
    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass  # older jax: run without the cache

    on_tpu = jax.default_backend() == "tpu"
    batch = 32768 if on_tpu else 256
    pipe = MaskPipeline(critic, masker,
                        {"critic": cp, "masker": mp},
                        batch_size=batch, with_checksum=True)

    # generate the batch ON DEVICE: uploading 32768 uint8 frames
    # (402 MB) through the ~22 MB/s tunnel costs ~18 minutes — that,
    # not compilation, is what ate the round-1/2 bench budget
    frames = jax.jit(
        lambda k: jax.random.randint(k, (batch, 64, 64, 3), 0, 256,
                                     dtype=jnp.uint8)
    )(jax.random.PRNGKey(0))

    # compile + warmup (first executions after compile pay a one-time
    # slow path on the tunneled runtime). One retry after a pause: the
    # tunneled backend occasionally throws a transient
    # FAILED_PRECONDITION on the first dispatch after another process
    # released the chip — a one-shot hiccup must not cost the round's
    # recorded number
    for attempt in range(2):
        try:
            for _ in range(2):
                *_, ck = pipe.run_device(frames)
                float(ck)
            break
        except Exception as e:
            # retry ONLY the known-transient tunnel states; a
            # deterministic failure (shape bug, OOM) must surface
            # immediately, not after a pointless 15 s pause
            # (ADVICE r3 / VERDICT r4 weak #6)
            transient = any(s in f"{type(e).__name__}: {e}" for s in
                            ("FAILED_PRECONDITION", "UNAVAILABLE",
                             "DEADLINE_EXCEEDED", "ABORTED"))
            if attempt or not transient:
                raise
            print(f"[bench] warmup attempt 1 failed with transient "
                  f"tunnel error ({type(e).__name__}: {e}); retrying "
                  "once in 15 s", flush=True)
            time.sleep(15)
            frames = jax.jit(
                lambda k: jax.random.randint(k, (batch, 64, 64, 3),
                                             0, 256, dtype=jnp.uint8)
            )(jax.random.PRNGKey(0))

    # median of 3 groups of 64 async-dispatched iterations, synced by
    # a single checksum readback per group. 64, not 8: each group pays
    # a fixed ~44 ms of tunnel RTT + enqueue once (measured by sweeping
    # n_iter 8->64: 56.6 -> 51.7 ms/iter, fitting dt + 44ms/n), so
    # small groups understate the device rate by ~9%; at 64 the
    # residual harness overhead is <1.5%
    n_iter = 64
    times = []
    for _ in range(3):
        t0 = time.time()
        cks = []
        for _ in range(n_iter):
            *_, ck = pipe.run_device(frames)
            cks.append(ck)
        float(sum(cks))  # host readback = hard sync
        times.append((time.time() - t0) / n_iter)
    dt = sorted(times)[1]
    fps = batch / dt

    headline = {
        "metric": "process_inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/s/chip (64x64 RGB, critic+masker)",
        "vs_baseline": round(fps / 100000.0, 3),
    }
    # the deliverable — print before ANY optional extra can stall
    print(json.dumps(headline), flush=True)

    # host-numpy param snapshots for the extras: the training chunks
    # donate their TrainState (donate_argnums), and on a CPU backend
    # JAX deletes donated input buffers in place — reusing the
    # original cp/mp arrays after the first chunk dispatch would raise
    # 'Array has been deleted' (the TPU path survives only because the
    # CPU->TPU transfer is non-aliasable)
    cp_h = jax.tree.map(np.asarray, cp)
    mp_h = jax.tree.map(np.asarray, mp)
    extras = {}
    try:
        extras.update(_training_throughput(jax, jnp, critic, masker,
                                           cp_h, mp_h))
    except Exception as e:  # extras must never kill the recorded line
        extras["train_error"] = repr(e)[:200]
    try:
        extras.update(_host_fed(jax, jnp, critic, masker, cp_h, mp_h,
                                MaskPipeline, batch))
    except Exception as e:
        extras["host_fed_error"] = repr(e)[:200]
    try:
        extras.update(_paper_width(jax, jnp, MaskPipeline, on_tpu))
    except Exception as e:
        extras["paper_width_error"] = repr(e)[:200]

    if extras:
        print(json.dumps({**headline, **extras}), flush=True)


def _training_throughput(jax, jnp, critic, masker, cp, mp):
    """Warm critic-chunk and masker-chunk scans at reference shapes
    (critic batch 64, masker K=32 -> 64+64), reporting steps/s — the
    driver-captured version of the RESULTS.md training table
    (VERDICT.md next-round item 5). Budget-gated per phase."""
    out = {}
    if remaining() < 60:
        return out
    from cgs_tpu import Config
    from cgs_tpu.train.loops import make_critic_chunk, make_masker_chunk
    from cgs_tpu.train.steps import (
        init_train_state, make_optimizer, trained_param_keys,
    )

    rng = np.random.default_rng(1)
    cfg = Config(shift=12, dropout=0.3, inject=True).derive()
    S = 100  # steps per scan chunk (= the reference viz cadence)
    kb = jax.random.PRNGKey(7)

    def time_chunk(chunk, state, *args):
        # pipeline 8 async chunk dispatches and sync once: a single
        # dispatch of S=100 steps pays the tunnel's ~70 ms RTT on top
        # of ~33-135 ms of device time, understating the device rate
        # by 1.3-2x; chaining the donated state amortizes the RTT
        key = jax.random.PRNGKey(0)
        state, losses = chunk(state, *args, key)   # compile + warm
        np.asarray(losses)
        rounds = 8
        t0 = time.time()
        for _ in range(rounds):
            state, losses = chunk(state, *args, key)
        np.asarray(losses)                          # hard sync
        return rounds * S / (time.time() - t0)

    # critic phase: bank of 1024 frames (generated on device — 12 MB
    # of H2D through the tunnel is ~35 s better spent elsewhere),
    # batch 64
    tx = make_optimizer()
    cstate = init_train_state({"critic": cp}, tx, ["critic"])
    chunk = make_critic_chunk(cfg, critic, tx)
    x_all = jax.jit(
        lambda k: jax.random.randint(k, (1024, 64, 64, 3), 0, 256,
                                     dtype=jnp.uint8))(kb)
    y_all = jax.jit(
        lambda k: jax.random.uniform(k, (1024,), jnp.float32))(kb)
    idx = jnp.asarray(rng.integers(0, 1024, (S, 64), dtype=np.int32))
    out["critic_train_steps_per_sec"] = round(
        time_chunk(chunk, cstate, x_all, y_all, idx), 1)

    if remaining() < 45:
        return out
    try:  # keep the already-measured critic rate if this phase fails
        # masker phase: K=32 high + 32 low, 64 contrast-negatives
        tx2 = make_optimizer()
        mstate = init_train_state({"critic": cp, "masker": mp}, tx2,
                                  trained_param_keys(cfg))
        mchunk = make_masker_chunk(cfg, critic, masker, tx2)
        xpos = x_all[:512]
        xneg = x_all[512:]
        ypos, yneg = y_all[:512], y_all[512:]
        h = jnp.asarray(rng.integers(0, 512, (S, 32), dtype=np.int32))
        l = jnp.asarray(rng.integers(0, 512, (S, 32), dtype=np.int32))
        c = jnp.asarray(rng.integers(0, 512, (S, 64), dtype=np.int32))
        out["masker_train_steps_per_sec"] = round(
            time_chunk(mchunk, mstate, xpos, ypos, xneg, yneg,
                       h, l, c), 1)
    except Exception as e:
        out["masker_train_error"] = repr(e)[:200]
    return out


def _paper_width(jax, jnp, MaskPipeline, on_tpu):
    """Device-resident throughput at the PAPER's architecture —
    chfak=5 (encoder 40/40/40/80, bottleneck 160, reference
    docs/index.html "Architecture"; nets.py:161,166,184,190) — so the
    driver records the published-width number alongside the chfak=1
    code-default headline. Budget-gated; bf16 (the recommended
    production dtype at this width, RESULTS.md chfak=5 section)."""
    if remaining() < 90:
        return {}
    from cgs_tpu import Critic, UnetDecoder

    critic = Critic(chfak=5, dropout=0.5, compute_dtype=jnp.bfloat16)
    masker = UnetDecoder(chfak=5, compute_dtype=jnp.bfloat16)
    # suspend the persistent cache around the host-CPU init: this
    # runs AFTER main() enabled it, and cached XLA:CPU AOT blobs
    # replay with ~1 KB machine-feature-mismatch warnings per program
    # (the round-2 captured-tail hazard the main init block dodges by
    # ordering)
    cache_dir = jax.config.jax_compilation_cache_dir
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
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    batch = 8192 if on_tpu else 128   # the chfak=5 HBM sweet spot
    pipe = MaskPipeline(critic, masker,
                        {"critic": jax.tree.map(np.asarray, cp),
                         "masker": jax.tree.map(np.asarray, mp)},
                        batch_size=batch, with_checksum=True)
    frames = jax.jit(
        lambda k: jax.random.randint(k, (batch, 64, 64, 3), 0, 256,
                                     dtype=jnp.uint8)
    )(jax.random.PRNGKey(0))
    for _ in range(2):
        *_, ck = pipe.run_device(frames)
        float(ck)
    if remaining() < 30:
        return {}
    times = []
    for _ in range(3):
        t0 = time.time()
        cks = []
        for _ in range(16):
            *_, ck = pipe.run_device(frames)
            cks.append(ck)
        float(sum(cks))
        times.append((time.time() - t0) / 16)
    fps = batch / sorted(times)[1]
    return {"paper_width_process_fps": round(fps, 1),
            "paper_width_note": "chfak=5 bf16 (the published "
                                "40/40/40/80/160-channel net), "
                                "device-resident, batch 8192"}


def _host_fed(jax, jnp, critic, masker, cp, mp, MaskPipeline, batch):
    """Host-fed MaskPipeline.run() — the path a real `-process` user
    hits (PIL folder -> host numpy -> chunked async H2D -> device).
    On this harness the number measures the ~22 MB/s tunnel, not the
    chip (each 64x64 RGB frame is 12 KB up + ~20 KB of outputs down);
    reported for completeness per VERDICT r1 #6, budget-gated so it
    can never cost the headline (the round-2 failure mode)."""
    if remaining() < 90:
        return {}
    # wire='u8' + in-graph binarization IS the production -process
    # path now (Handler.segment selects it whenever -crf is off;
    # VERDICT r3 #4) — mask D2H drops f32 16 KB/frame -> uint8
    # 4(+4 hard) KB/frame on this transfer-bound path.
    #
    # Up to 5 INTERLEAVED u8/f32 trials (VERDICT r4 weak #1 / next #3):
    # the tunnel's load swings 2x on minute timescales, so a single
    # A-then-B shot cannot rank the wires — interleaving puts both
    # wires under the same load profile; median + min/max expose the
    # spread the driver saw.
    n_frames = 4096
    u8_pipe = MaskPipeline(critic, masker,
                           {"critic": cp, "masker": mp},
                           batch_size=min(batch, n_frames),
                           wire="u8", hard_threshold=0.5)
    f32_pipe = MaskPipeline(critic, masker,
                            {"critic": cp, "masker": mp},
                            batch_size=min(batch, n_frames))
    host_frames = np.random.default_rng(0).integers(
        0, 256, (n_frames, 64, 64, 3), dtype=np.uint8)
    u8_pipe.run(host_frames)   # compile + warm AT THE TIMED SHAPE
    f32_pipe.run(host_frames)
    u8_fps, f32_fps = [], []
    for _ in range(5):
        # one timed pass per wire per trial, u8/f32 back-to-back so a
        # tunnel-load swing hits both wires of a trial roughly equally
        if remaining() < 2 * 1.5 * n_frames / max(
                min(u8_fps + f32_fps, default=400.0), 50.0):
            break
        t0 = time.time()
        u8_pipe.run(host_frames)
        u8_fps.append(n_frames / (time.time() - t0))
        t0 = time.time()
        f32_pipe.run(host_frames)
        f32_fps.append(n_frames / (time.time() - t0))
    if not u8_fps:
        return {}
    out = {
        "host_fed_frames_per_sec": round(float(np.median(u8_fps)), 1),
        "host_fed_u8_min_max": [round(min(u8_fps), 1),
                                round(max(u8_fps), 1)],
        "host_fed_trials": len(u8_fps),
        "host_fed_note": "u8 wire (the -process default); median of "
                         "interleaved u8/f32 trials; bounded by this "
                         "harness's ~22MB/s tunnel, not the chip; see "
                         "RESULTS.md",
    }
    if f32_fps:
        out["host_fed_f32_frames_per_sec"] = round(
            float(np.median(f32_fps)), 1)
        out["host_fed_f32_min_max"] = [round(min(f32_fps), 1),
                                       round(max(f32_fps), 1)]
    return out


if __name__ == "__main__":
    main()
