"""Tracing / profiling (SURVEY.md §5 — absent in the reference, which
has only carriage-return prints, main.py:196).

Provides jax.profiler integration: named trace annotations around the
scanned train chunks and eval batches, plus an xplane trace dump
(viewable in TensorBoard/Perfetto) gated on --profile. Throughput
meters live in cgs_tpu/utils/metrics.py.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


class Profiler:
    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir
        self._active = False

    def start(self) -> None:
        if self.trace_dir and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    @contextlib.contextmanager
    def annotate(self, name: str):
        """Named region in the xplane timeline (also useful without an
        active trace — it is a no-op then)."""
        with jax.profiler.TraceAnnotation(name):
            yield

    @contextlib.contextmanager
    def trace(self):
        self.start()
        try:
            yield self
        finally:
            self.stop()


def nan_guard(tree, where: str = "") -> None:
    """Debug-mode NaN/Inf detection over a pytree of device arrays
    (SURVEY.md §5 'race detection / sanitizers' row: jit purity +
    NaN guards). Raises FloatingPointError on the first bad leaf."""
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                leaf.dtype, jnp.floating):
            continue
        if not bool(jnp.isfinite(leaf).all()):
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {where}{name}")
