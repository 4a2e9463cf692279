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

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


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

    batch = 32768 if jax.default_backend() == "tpu" else 256
    pipe = MaskPipeline(critic, masker,
                        {"critic": cp, "masker": mp},
                        batch_size=batch, with_checksum=True)

    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 64, 64, 3), dtype=np.uint8))

    # compile + warmup (first executions after compile pay a one-time
    # slow path on the tunneled runtime — warm thoroughly)
    for _ in range(3):
        *_, ck = pipe.run_device(frames)
        float(ck)

    # median of 3 groups of 8 async-dispatched iterations, synced by a
    # single checksum readback per group
    n_iter = 8
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

    # host-fed MaskPipeline.run() — the path a real `-process` user
    # hits (PIL folder -> host numpy -> chunked async H2D -> device).
    # On this harness the number measures the ~22 MB/s tunnel, not the
    # chip (each 64x64 RGB frame is 12 KB up + ~20 KB of outputs
    # down); reported anyway for completeness per VERDICT r1 #6.
    host_pipe = MaskPipeline(critic, masker,
                             {"critic": cp, "masker": mp},
                             batch_size=min(batch, 4096))
    host_frames = np.asarray(frames[:4096])
    host_pipe.run(host_frames)  # compile + warm AT THE TIMED SHAPE
    t0 = time.time()
    host_pipe.run(host_frames)
    host_fps = host_frames.shape[0] / (time.time() - t0)

    print(json.dumps({
        "metric": "process_inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/s/chip (64x64 RGB, critic+masker)",
        "vs_baseline": round(fps / 100000.0, 3),
        "host_fed_frames_per_sec": round(host_fps, 1),
        "host_fed_note": "bounded by this harness's ~22MB/s tunnel "
                         "H2D, not the chip; see RESULTS.md",
    }))


if __name__ == "__main__":
    main()
