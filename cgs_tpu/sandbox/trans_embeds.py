"""VGG feature cosine-similarity maps (reference `trans_embeds`,
TrainHandler.py:1423-1520).

Takes a small frame batch through the VGG11 embedder (every post-ReLU
feature map bilinearly resized to 64x64 and channel-concatenated,
nets.py:744-751), then for sliding channel windows ("scopes") computes
the cosine similarity of every pixel's embedding against three fixed
target-pixel embeddings, renders similarity and thresholded-similarity
rows under the RGB frames, and saves one composite strip PNG named
`i{interval}-s{step}.png` (TrainHandler.py:1484-1486).

TPU design: the VGG forward and ALL scope/target similarity maps run
as one jitted program (the scopes are static slices, the cosine
reduction is a batched matvec); only the PNG composition is host-side.
Weights default to random init — this env ships no torchvision
pretrained weights; pass converted params for parity with upstream
(zoo.VGG11Features mirrors torchvision vgg11 layer-for-layer).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from matplotlib.colors import hsv_to_rgb

from cgs_tpu.models.zoo import VGG11Features, imagenet_normalize

Array = jnp.ndarray

DEFAULT_TARGETS: Tuple[Tuple[int, int, int], ...] = (
    (4, 32, 32), (4, 12, 32), (0, 48, 32))  # TrainHandler.py:1452


def trans_embeds(frames_hsv: np.ndarray, out_dir: str,
                 params=None, interval: int = 128, step: int = 64,
                 thresh: float = 0.5,
                 targets: Sequence[Tuple[int, int, int]] = DEFAULT_TARGETS,
                 max_scopes: int | None = None,
                 hsv: bool = True, seed: int = 0) -> str:
    """Run the trans_embeds visualization; returns the PNG path.

    frames_hsv: (B, 64, 64, 3) floats in [0, 1] (HSV when hsv=True,
    mirroring `model.forward(X, hsv=True)` at TrainHandler.py:1438).
    The reference uses its first 8 frames and targets indexing frame 4
    (:1436, :1452) — B must cover the target frame indices.
    max_scopes truncates the channel sweep (the full VGG11 embed is
    2752 channels -> 43 scopes; tests use a handful).
    """
    os.makedirs(out_dir, exist_ok=True)
    x_hsv = np.asarray(frames_hsv, np.float32)
    rgb = hsv_to_rgb(x_hsv) if hsv else x_hsv

    model = VGG11Features(collect_embeds=True)
    xj = jnp.asarray(rgb)
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            imagenet_normalize(xj))["params"]

    # channel count via shape-only tracing — no compile, no forward
    # (simmaps below is the single compiled VGG program)
    n_ch = jax.eval_shape(
        lambda p, x: model.apply({"params": p},
                                 imagenet_normalize(x))[1],
        params, xj).shape[-1]
    scopes = [(i * step, i * step + interval)
              for i in range(n_ch // step)]  # TrainHandler.py:1446
    if max_scopes is not None:
        scopes = scopes[:max_scopes]

    @jax.jit
    def simmaps(p, x):
        _, emb = model.apply({"params": p}, imagenet_normalize(x))
        maps = []
        for lo, hi in scopes:
            e = emb[..., lo:hi]
            for fi, ty, tx in targets:
                t = e[fi, ty, tx]           # (c,)
                num = jnp.einsum("bhwc,c->bhw", e, t)
                den = (jnp.linalg.norm(e, axis=-1)
                       * jnp.maximum(jnp.linalg.norm(t), 1e-12))
                sim = num / jnp.maximum(den, 1e-12)
                maps.append(sim)
                maps.append(sim * (sim > thresh))
        return jnp.stack(maps)              # (n_scopes*6, B, 64, 64)

    maps = np.asarray(simmaps(params, xj))

    # host-side strip composition (TrainHandler.py:1458-1486)
    vizs = [np.concatenate(rgb, axis=1)]
    spacer = np.full((10, rgb.shape[0] * 64, 3), 0.5, np.float32)
    per_scope = 2 * len(targets)
    for si in range(len(scopes)):
        for m in maps[si * per_scope:(si + 1) * per_scope]:
            weighted = rgb * m[:, :, :, None]
            vizs.append(np.concatenate(weighted, axis=1))
        vizs.append(spacer)
    viz = np.concatenate(vizs, axis=0)

    from PIL import Image
    path = os.path.join(out_dir, f"i{interval}-s{step}.png")
    Image.fromarray(np.uint8(255 * np.clip(viz, 0, 1))).save(path)
    return path
