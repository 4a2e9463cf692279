"""Dense-CRF mask refinement (reference main.py:1226-1263).

Backend: the first-party C++ mean-field solver in native/densecrf
(permutohedral-lattice bilateral + spatial Gaussian pairwise terms),
loaded via ctypes and auto-built with `make` on first use. This
replaces the reference's pydensecrf/SimpleCRF wheel — the one
genuinely native dependency of its `-CRF` pipeline (SURVEY.md §2.2).

Fixed parameters exactly as the reference's grid-collapsed choice
(main.py:1230-1235): w1=22 (bilateral weight), alpha=12 (spatial std),
beta=3.1 (rgb std), w2=8 (spatial weight), gamma=1.8 (std), 10 iters.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           "native", "densecrf")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcgs_densecrf.so")

DEFAULT_PARAMS = dict(w1=22.0, alpha=12.0, beta=3.1, w2=8.0,
                      gamma=1.8, iters=10)


def _build() -> None:
    proc = subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        # surface the compiler diagnostic — a bare CalledProcessError
        # hides it in a never-read .stderr attribute
        raise RuntimeError(
            f"native densecrf build failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}")


def _ensure_built(timeout_s: float = 300.0) -> None:
    """Build the native library exactly once across a multi-host run
    on a shared filesystem: host 0 runs make, others poll for the .so
    (concurrent make invocations clobber each other's objects
    mid-link). Host 0 invokes make even when the .so exists — make's
    mtime tracking makes a fresh build a no-op, while an
    existence-only check would silently keep dlopening a stale .so
    after a source edit."""
    from cgs_tpu.parallel.multihost import is_primary
    if is_primary():
        _build()
        return
    if os.path.exists(_LIB_PATH):
        return
    import time as _time
    deadline = _time.time() + timeout_s
    while not os.path.exists(_LIB_PATH):
        if _time.time() > deadline:
            raise RuntimeError(
                f"timed out waiting for host 0 to build {_LIB_PATH}")
        _time.sleep(1.0)


def _load_lib() -> ctypes.CDLL:
    _ensure_built()
    lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    lib.cgs_densecrf_batch.restype = ctypes.c_int
    lib.cgs_densecrf_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # imgs
        ctypes.POINTER(ctypes.c_float),   # probs
        ctypes.c_int,                     # n_frames
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # H, W, C
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_int,                     # iters
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.c_int,                     # n_threads
    ]
    return lib


class DenseCRF:
    """Batched 2-class CRF refinement callable:
    (imgs uint8 (N,H,W,3), masks float (N,H,W)) -> bool (N,H,W).

    `skip` strides the refinement exactly like the reference's crf()
    (main.py:1239): only every skip-th frame is refined, others keep
    their (thresholded) input mask."""

    def __init__(self, params: Optional[dict] = None, skip: int = 1,
                 debug_dir: Optional[str] = None, n_threads: int = 0,
                 rescale: bool = False):
        self.lib = _load_lib()
        self.params = dict(DEFAULT_PARAMS, **(params or {}))
        self.skip = skip
        self.debug_dir = debug_dir
        self.n_threads = n_threads  # 0 = hardware concurrency
        self.rescale = rescale

    def __call__(self, imgs: np.ndarray,
                 masks: np.ndarray) -> np.ndarray:
        masks = np.asarray(masks, np.float32)
        if masks.ndim == 4:  # (N,1,H,W) or (N,H,W,1)
            masks = masks.squeeze(1) if masks.shape[1] == 1 \
                else masks.squeeze(-1)
        if self.rescale:
            # -crf_rescale (framework extension, default off): L1
            # sparsity can push in-mask confidence below the 0.5
            # decision boundary the CRF unaries imply, collapsing
            # refinement; rescale each frame's peak toward 0.9 without
            # touching already-confident masks
            peak = masks.max(axis=(1, 2), keepdims=True)
            factor = np.where(peak > 1e-6,
                              np.maximum(0.9 / np.maximum(peak, 1e-6),
                                         1.0), 1.0)
            masks = np.clip(masks * factor, 0.0, 1.0)
        if len(masks) == 0:
            # empty batch (e.g. the [100:5000:2] eval slice of a short
            # folder): mirror MaskPipeline.run's n==0 support instead
            # of tripping the native n_frames<=0 guard
            return np.zeros(masks.shape, bool)
        refined = masks.copy()
        sel = np.arange(0, len(masks), self.skip)
        sub = masks[sel]
        n, h, w = sub.shape
        probs = np.ascontiguousarray(
            np.stack([1.0 - sub, sub], axis=-1), np.float32)
        sub_imgs = np.ascontiguousarray(imgs[sel], np.uint8)
        out = np.empty((n, h, w), np.uint8)
        p = self.params
        rc = self.lib.cgs_densecrf_batch(
            sub_imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, h, w, 2,
            ctypes.c_float(p["w1"]), ctypes.c_float(p["alpha"]),
            ctypes.c_float(p["beta"]), ctypes.c_float(p["w2"]),
            ctypes.c_float(p["gamma"]), int(p["iters"]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.n_threads)
        if rc != 0:
            raise RuntimeError(f"cgs_densecrf_batch failed rc={rc}")
        refined[sel] = out
        if self.debug_dir:  # every 50th refined frame (main.py:1245)
            self._dump_debug(imgs, masks, out, sel)
        return refined >= 1  # main.py:1263

    def _dump_debug(self, imgs, masks, out, sel):
        from cgs_tpu.utils.artifacts import save_image
        for j, i in enumerate(sel[::50]):
            save_image(os.path.join(self.debug_dir,
                                    f"{i}_mask.png"), masks[i])
            save_image(os.path.join(self.debug_dir, f"{i}_img.png"),
                       imgs[i].astype(np.float32) / 255.0)
            save_image(os.path.join(self.debug_dir, f"{i}_crf.png"),
                       out[j * 50].astype(np.float32))


def grid_search(imgs: np.ndarray, masks: np.ndarray, gt: np.ndarray,
                w1=(22.0,), alpha=(12.0,), beta=(3.1,), w2=(8.0,),
                gamma=(1.8,), iters=(10,), skip: int = 1,
                n_threads: int = 0):
    """CRF hyperparameter grid search (the reference's crf() retains
    exactly this scaffolding: per-combo refinement, IoU vs GT, sorted
    results, main.py:1230-1262). Returns (results sorted ascending by
    IoU as [(params_dict, iou)], best_refined_masks)."""
    results = []
    best = None
    for a in w1:
        for b in alpha:
            for c in beta:
                for d in w2:
                    for e in gamma:
                        for it in iters:
                            params = dict(w1=a, alpha=b, beta=c, w2=d,
                                          gamma=e, iters=it)
                            crf = DenseCRF(params, skip=skip,
                                           n_threads=n_threads)
                            refined = crf(imgs, masks)
                            s = skip
                            inter = np.sum(gt[::s] & refined[::s])
                            union = np.sum(gt[::s] | refined[::s])
                            r = inter / max(union, 1)
                            results.append((params, float(r)))
                            if best is None or r >= best[1]:
                                best = (refined, r)
    results.sort(key=lambda pr: pr[1])
    return results, best[0]
