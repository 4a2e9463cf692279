"""CLI entry point with the reference's flag grammar and dispatch
order (main.py:1548-1570):

    load data -> load ckpts -> critic train -> masker train -> eval ->
    visualize -> process

Run `python -m cgs_tpu.cli -train --model my-run ...` exactly as you
would run the reference's `python main.py ...`.
"""

from __future__ import annotations

from typing import Optional

from cgs_tpu.core.config import parse_args
from cgs_tpu.handler import CRITIC, MASKER, Handler
from cgs_tpu.parallel.multihost import ensure_initialized


def main(argv: Optional[list] = None) -> Handler:
    # multi-host topologies (no-op on a single host): jax.distributed
    # must come up before the first backend query so every process
    # sees the global device set (SURVEY.md §5)
    ensure_initialized()
    cfg = parse_args(argv)
    handler = Handler(cfg)

    # --profile: ONE xplane trace spanning every dispatched phase
    # (critic, masker, eval, process) — try/finally so a mid-run
    # exception still flushes the trace
    with handler.profiler.trace():
        _dispatch(cfg, handler)
    return handler


def _dispatch(cfg, handler: Handler) -> None:
    if cfg.train:
        handler.load_data()
    if cfg.trainasvis:                 # main.py:1551-1553
        handler.visualize()
        return
    if cfg.cload:                      # main.py:1554-1557
        handler.load_models([CRITIC])
    if cfg.mload:
        handler.load_models([MASKER])
    if cfg.train:                      # main.py:1558-1564
        if cfg.critic:
            handler.critic_pipe(mode="train")
            handler.save_models([CRITIC])
        if cfg.masker:
            handler.segmentation_training()
            handler.save_models([MASKER])
    if cfg.eval:                       # main.py:1565-1566
        handler.eval()
    if cfg.viscritic or cfg.vismasker:  # main.py:1567-1568
        handler.visualize()
    if cfg.process:                    # main.py:1569-1570
        handler.segment(folder=cfg.source_imgs)


if __name__ == "__main__":
    main()
