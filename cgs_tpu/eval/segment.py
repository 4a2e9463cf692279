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


def load_folder(folder: str):
    """(X float (N,H,W,3) in [0,1], stem names) — PIL load of every
    image file (main.py:1126-1128)."""
    names = sorted(os.listdir(folder))
    frames, stems = [], []
    for name in names:
        if "." not in name:
            continue
        try:
            img = np.asarray(Image.open(os.path.join(folder, name)))
        except Exception:
            continue
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        frames.append(img[..., :3])
        stems.append(name[: name.rindex(".")])
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


def segment_folder(cfg, pipeline, folder: str, crf_fn=None,
                   out_dir: str = None, write: bool = True) -> Dict:
    """Run inference over a folder and write result PNGs. Returns the
    variant arrays for testing. write=False keeps the (SPMD) compute
    but skips the files — non-primary hosts of a multi-host run."""
    x, stems = load_folder(folder)
    out = pipeline.run((x * 255).astype(np.uint8))
    preds, masks, sal = out.preds, out.masks, out.saliency

    # ordered mask variants, mirroring allM (main.py:1160-1203)
    all_m: List[np.ndarray] = [masks.squeeze(-1)]
    if cfg.binarymaskthreshold:                  # main.py:1163-1167
        all_m.append((masks >= cfg.binarymaskthreshold).squeeze(-1)
                     .astype(np.float32))
    if cfg.crf and crf_fn is not None:           # main.py:1169-1172
        all_m.append(crf_fn((x * 255).astype(np.uint8),
                            masks.squeeze(-1)).astype(np.float32))
    if cfg.process_salience and sal is not None:  # main.py:1176-1203
        norm_fn = normalize_saliency_global if cfg.salglobal \
            else normalize_saliency_topk
        sal_soft, sal_hard = (np.asarray(v) for v in norm_fn(
            sal, preds, cfg.salience_thresh))
        all_m.extend([sal_soft.squeeze(-1),
                      sal_hard.squeeze(-1).astype(np.float32)])
        if cfg.crf and crf_fn is not None:
            all_m.append(crf_fn((x * 255).astype(np.uint8),
                                sal_soft.squeeze(-1))
                         .astype(np.float32))

    out_dir = out_dir or cfg.mask_output_imgs
    if not write:
        return {"preds": preds, "variants": all_m, "stems": stems}
    os.makedirs(out_dir, exist_ok=True)
    for fidx, stem in enumerate(stems):
        rgb = (255 * x[fidx]).astype(np.uint8)
        mask_imgs = [
            (255 * np.clip(m[fidx], 0, 1)).astype(np.uint8)
            for m in all_m]
        mask_rgb = [np.repeat(m[..., None], 3, axis=-1)
                    for m in mask_imgs]
        if cfg.concatenated:                      # main.py:1216-1219
            strip = np.concatenate([rgb] + mask_rgb, axis=1)
            Image.fromarray(strip).save(
                os.path.join(out_dir, f"{stem}_with_mask.png"))
        else:                                     # main.py:1220-1223
            for midx, m in enumerate(mask_rgb):
                Image.fromarray(m).save(os.path.join(
                    out_dir, f"{stem}-{VARIANT_COLUMNS[midx]}.png"))
    return {"preds": preds, "variants": all_m, "stems": stems}
