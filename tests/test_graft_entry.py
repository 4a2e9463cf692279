"""Driver-contract regression tests for __graft_entry__.

The multichip dry run MUST pass in a FRESH process of THIS environment
(where sitecustomize pins JAX_PLATFORMS to the axon TPU plugin and
XLA_FLAGS is unset) — exactly the condition the driver runs it under,
and exactly the condition that broke round 1 (MULTICHIP_r01.json:
ok=false; the backend was initialized before the CPU device count was
forced). These tests therefore run in subprocesses, not in the pytest
process (whose conftest already reconfigured jax).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_env():
    env = dict(os.environ)
    # undo anything the pytest conftest exported; the driver's process
    # has no host_platform_device_count forced
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow  # 8-device dryrun in a fresh process (~1.6 min; entry smoke stays fast)
def test_dryrun_multichip_fresh_process():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_fresh_env(), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout, (
        proc.stdout, proc.stderr[-2000:])
    # programs 5-6 (VERDICT r4 #4): the meshed masker SCANNED chunk and
    # the seed-sharded seed_parallel critic chunk must have executed
    assert "masker_chunk_losses_shape=(2, 4)" in proc.stdout
    assert "seed_parallel_losses_shape=(16, 2)" in proc.stdout


def test_entry_compiles_fresh_process():
    code = (
        "import __graft_entry__, jax\n"
        "fn, args = __graft_entry__.entry()\n"
        "jax.jit(fn).lower(*args).compile()\n"
        "print('entry ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_fresh_env(), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry ok" in proc.stdout
