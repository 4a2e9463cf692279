"""Multi-seed run aggregation (reference TrainHandler.py `main()`
multi-run loop, 4024-4056): repeat the full pipeline over `--runs`
seeds and append mean/std/best IoU to `results.txt` — the mechanism
behind the paper's "IoU mean over 10 training seeds" table."""

from __future__ import annotations


from typing import List, Optional

import numpy as np


def run_seeds(argv: List[str], runs: int,
              results_path: str = "results.txt",
              base_seed: int = 0) -> dict:
    """Invoke the full CLI pipeline `runs` times with distinct seeds;
    aggregate the primary (mask) IoU. argv: CLI args WITHOUT --seed.
    Returns {'ious', 'mean', 'std', 'best'} and appends to
    results.txt (TrainHandler.py:4048-4056 format spirit)."""
    from cgs_tpu.cli import main

    ious = []
    for r in range(runs):
        seed = base_seed + r
        handler = main(argv + ["--seed", str(seed),
                               "--model", _seeded_name(argv, seed)])
        # last_ious, NOT handler.ious: the reference-parity tracker is
        # never updated by eval() (main.py:1018 is commented out)
        ious.append(handler.last_ious[0] if handler.last_ious
                    else float(handler.ious[0]))
        handler.close()   # release the per-run metrics.jsonl handle
        print(f"[multirun] seed {seed}: IoU {ious[-1]}")

    arr = np.asarray(ious)
    summary = {"ious": ious, "mean": float(arr.mean()),
               "std": float(arr.std()), "best": float(arr.max())}
    line = (f"runs={runs} args={' '.join(argv)} "
            f"ious={[round(v, 3) for v in ious]} "
            f"mean={summary['mean']:.3f} std={summary['std']:.3f} "
            f"best={summary['best']:.3f}\n")
    with open(results_path, "a") as fp:
        fp.write(line)
    return summary


def _seeded_name(argv: List[str], seed: int) -> str:
    """Run-name for one seed; handles both '--model X' and
    '--model=X' argparse forms (missing either, argparse's own error
    fires later — we must not mask it by appending a default that
    silently wins)."""
    name = "default-model"
    for i, tok in enumerate(argv):
        if tok == "--model" and i + 1 < len(argv):
            name = argv[i + 1]
        elif tok.startswith("--model="):
            name = tok.split("=", 1)[1]
    return f"{name}-seed{seed}"


def pop_int(argv: List[str], flag: str, default: int) -> int:
    """Extract `<flag> N` or `<flag>=N` from argv IN PLACE — for
    driver-level flags the Config grammar must not learn (they are not
    reference flags). Both argparse spellings must be handled here:
    `--runs` is also a dead flag in the Config grammar, so a missed
    `--runs=5` would be silently swallowed downstream and train one
    seed instead of five (ADVICE r4)."""
    for i, tok in enumerate(argv):
        if tok == flag:
            if i + 1 >= len(argv):
                raise SystemExit(f"{flag} requires a value")
            value = int(argv[i + 1])
            del argv[i:i + 2]
            return value
        if tok.startswith(flag + "="):
            value = int(tok.split("=", 1)[1])
            del argv[i]
            return value
    return default


def pop_runs(argv: List[str], default: int = 1) -> int:
    """Extract `--runs N` from argv IN PLACE (shared by the serial and
    seed-parallel CLI entries; upstream parses the flag but never
    reads it, TrainHandler.py:4024 is the living version)."""
    return pop_int(argv, "--runs", default)


def main(argv: Optional[List[str]] = None) -> None:
    """`python -m cgs_tpu.sandbox.multirun --runs N <cli args...>` —
    the reference's `--runs` flag made functional (it is parsed but
    dead in main.py)."""
    import sys
    argv = list(argv if argv is not None else sys.argv[1:])
    runs = pop_runs(argv)
    run_seeds(argv, runs)


if __name__ == "__main__":
    main()
