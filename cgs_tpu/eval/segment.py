"""Batch folder inference — the `-process` mode (reference
main.py:1103-1223).

Reads every image in --source-imgs, runs the fused inference pipeline,
optionally thresholds (--binarymaskthreshold), CRF-refines (-crf) and
computes saliency (-process_salience), then writes PNGs to
--mask-output-imgs with the reference's exact naming scheme:
`{name}_with_mask.png` strips under -concatenated, else per-variant
suffixes raw-mask / thresholded-mask / crf-mask / saliency-map /
thresholded-saliency / crf-saliency (main.py:1210-1223).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
from PIL import Image

from cgs_tpu.ops.saliency import (
    normalize_saliency_global, normalize_saliency_topk,
)

VARIANT_COLUMNS = ["raw-mask", "thresholded-mask", "crf-mask",
                   "saliency-map", "thresholded-saliency",
                   "crf-saliency"]


def _io_threads() -> int:
    """Host-IO thread count for folder decode / PNG encode: PIL
    releases the GIL inside libjpeg/libpng/zlib, so threads scale on
    real deployment hosts (the reference decodes serially,
    main.py:1126-1128). CGS_IO_THREADS overrides; <=1 means serial —
    the default on a 1-CPU host."""
    env = os.environ.get("CGS_IO_THREADS", "")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            print(f"[cgs-tpu] ignoring non-integer CGS_IO_THREADS="
                  f"{env!r}")
    return min(16, os.cpu_count() or 1)


def _ordered_map(fn, items):
    """map() preserving order, threaded when _io_threads() > 1."""
    n = _io_threads()
    if n <= 1 or len(items) <= 1:
        return [fn(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n) as pool:
        return list(pool.map(fn, items))


def load_folder(folder: str):
    """(X float (N,H,W,3) in [0,1], stem names) — PIL load of every
    image file (main.py:1126-1128); decode threads across files
    (_io_threads), order and skip-on-error semantics unchanged."""
    names = [n for n in sorted(os.listdir(folder)) if "." in n]

    def decode(name):
        try:
            img = np.asarray(Image.open(os.path.join(folder, name)))
        except Exception:
            return None
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        return img[..., :3]

    decoded = _ordered_map(decode, names)
    frames = [d for d in decoded if d is not None]
    stems = [name[: name.rindex(".")]
             for name, d in zip(names, decoded) if d is not None]
    if not frames:
        raise RuntimeError(f"no readable images in {folder}")
    shapes = {f.shape for f in frames}
    if len(shapes) > 1 or frames[0].shape[:2] != (64, 64):
        raise ValueError(
            f"the critic/masker operate on 64x64 RGB frames; folder "
            f"{folder} contains shapes {sorted(shapes)} — resize "
            "inputs first (the reference has the same fixed-size "
            "contract, nets.py:161)")
    return np.stack(frames) / 255.0, stems


def _png8(m: np.ndarray) -> np.ndarray:
    """Float mask -> PNG-space uint8, exactly as the reference writes
    it (`(m*255).astype(uint8)`, main.py:1216-1223; clip guards CRF/
    saliency variants that can exceed [0,1])."""
    return (255 * np.clip(m, 0, 1)).astype(np.uint8)


def _mask_variants(cfg, pipeline, x: np.ndarray, crf_fn=None):
    """(preds, ordered float variant list, PNG-space uint8 list) for
    float frames x in [0,1] — the allM construction
    (main.py:1160-1203), shared by the folder and video drivers.

    With a reduced-wire pipeline (wire='u8', VERDICT r3 #4) the soft
    mask arrives PNG-space-quantized uint8 and the binarization
    arrives as the in-graph uint8 plane — the PNG outputs are
    bit-identical to the f32 path (test_wire_reduction.py) at 1/4 the
    D2H transfer; the float `variants` entries are then the quantized
    values (q/255, and exact 0/1 hard masks)."""
    x_u8 = (x * 255).astype(np.uint8)  # one conversion for pipeline+CRFs
    out = pipeline.run(x_u8)
    preds, sal = out.preds, out.saliency

    all_m: List[np.ndarray] = []
    all_png: List[np.ndarray] = []
    if out.masks_u8 is not None:       # reduced wire
        if cfg.crf and crf_fn is not None:
            raise ValueError(
                "CRF refinement needs f32 soft masks — construct the "
                "pipeline with wire='f32' when -crf is on "
                "(Handler.segment selects this automatically)")
        q = out.masks_u8.squeeze(-1)
        all_m.append(q.astype(np.float32) / 255.0)
        all_png.append(q)
        if cfg.binarymaskthreshold:              # main.py:1163-1167
            hard = out.hard.squeeze(-1)
            all_m.append(hard.astype(np.float32))
            all_png.append(hard * np.uint8(255))
    else:
        masks = out.masks
        all_m.append(masks.squeeze(-1))
        if cfg.binarymaskthreshold:              # main.py:1163-1167
            if out.hard is not None:   # device-side binarization
                all_m.append(out.hard.squeeze(-1).astype(np.float32))
            else:
                all_m.append((masks >= cfg.binarymaskthreshold)
                             .squeeze(-1).astype(np.float32))
        if cfg.crf and crf_fn is not None:       # main.py:1169-1172
            all_m.append(crf_fn(x_u8,
                                masks.squeeze(-1)).astype(np.float32))
        all_png.extend(_png8(m) for m in all_m)
    if cfg.process_salience and sal is not None:  # main.py:1176-1203
        norm_fn = normalize_saliency_global if cfg.salglobal \
            else normalize_saliency_topk
        sal_soft, sal_hard = (np.asarray(v) for v in norm_fn(
            sal, preds, cfg.salience_thresh))
        sal_entries = [sal_soft.squeeze(-1),
                       sal_hard.squeeze(-1).astype(np.float32)]
        if cfg.crf and crf_fn is not None and out.masks_u8 is None:
            sal_entries.append(crf_fn(x_u8, sal_soft.squeeze(-1))
                               .astype(np.float32))
        all_m.extend(sal_entries)
        all_png.extend(_png8(m) for m in sal_entries)
    return preds, all_m, all_png


def segment_folder(cfg, pipeline, folder: str, crf_fn=None,
                   out_dir: str = None, write: bool = True) -> Dict:
    """Run inference over a folder and write result PNGs. Returns the
    variant arrays for testing. write=False keeps the (SPMD) compute
    but skips the files — non-primary hosts of a multi-host run."""
    x, stems = load_folder(folder)
    preds, all_m, all_png = _mask_variants(cfg, pipeline, x, crf_fn)

    out_dir = out_dir or cfg.mask_output_imgs
    if not write:
        return {"preds": preds, "variants": all_m, "stems": stems}
    os.makedirs(out_dir, exist_ok=True)

    def write_frame(args):                # PNG encode threads too
        fidx, stem = args
        rgb = (255 * x[fidx]).astype(np.uint8)
        mask_rgb = [np.repeat(m[fidx][..., None], 3, axis=-1)
                    for m in all_png]
        if cfg.concatenated:                      # main.py:1216-1219
            strip = np.concatenate([rgb] + mask_rgb, axis=1)
            Image.fromarray(strip).save(
                os.path.join(out_dir, f"{stem}_with_mask.png"))
        else:                                     # main.py:1220-1223
            for midx, m in enumerate(mask_rgb):
                Image.fromarray(m).save(os.path.join(
                    out_dir, f"{stem}-{VARIANT_COLUMNS[midx]}.png"))

    _ordered_map(write_frame, list(enumerate(stems)))
    return {"preds": preds, "variants": all_m, "stems": stems}


# -- video input (framework extension; the reference only reads image
#    folders) ----------------------------------------------------------

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def load_video(path: str):
    """Decode a video into (N, 64, 64, 3) float frames in [0,1] + fps.
    Unlike the folder contract (fixed 64x64, load_folder above),
    frames are resized — FPV footage is never 64x64 natively."""
    import cv2
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 32.0
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if rgb.shape[:2] != (64, 64):
            rgb = cv2.resize(rgb, (64, 64),
                             interpolation=cv2.INTER_AREA)
        frames.append(rgb)
    cap.release()
    if not frames:
        raise RuntimeError(f"no decodable frames in {path}")
    return np.stack(frames) / 255.0, float(fps)


def segment_video(cfg, pipeline, path: str, crf_fn=None,
                  out_dir: str = None, write: bool = True) -> Dict:
    """-process on a video file: decode -> batched inference -> mask
    videos. -concatenated writes one `{stem}_with_mask.mp4` strip
    (input + every variant side by side, like the PNG strips); without
    it, one `{stem}-{variant}.mp4` per variant — mirroring the folder
    driver's naming verbatim."""
    from cgs_tpu.utils.video import vidwrite

    x, fps = load_video(path)
    preds, all_m, all_png = _mask_variants(cfg, pipeline, x, crf_fn)

    stem = os.path.splitext(os.path.basename(path))[0]
    out_dir = out_dir or cfg.mask_output_imgs
    if not write:
        return {"preds": preds, "variants": all_m, "stems": [stem],
                "fps": fps}
    os.makedirs(out_dir, exist_ok=True)
    rgb = (255 * x).astype(np.uint8)
    mask_rgb = [np.repeat(m[..., None], 3, axis=-1) for m in all_png]
    if cfg.concatenated:
        strip = np.concatenate([rgb] + mask_rgb, axis=2)
        vidwrite(os.path.join(out_dir, f"{stem}_with_mask.mp4"),
                 strip, framerate=max(int(round(fps)), 1))
    else:
        for midx, m in enumerate(mask_rgb):
            vidwrite(os.path.join(
                out_dir, f"{stem}-{VARIANT_COLUMNS[midx]}.mp4"),
                m, framerate=max(int(round(fps)), 1))
    return {"preds": preds, "variants": all_m, "stems": [stem],
            "fps": fps}
