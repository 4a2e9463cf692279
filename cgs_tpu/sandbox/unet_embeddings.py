"""U-Net embedding-space visualization (reference
`vis_unet_embeddings`, TrainHandler.py:1592-1686) and the U-Net
offline/online result video (`vis_unet`, TrainHandler.py:2652-2720).

Forwards a frame sample plus labeled tree-trunk crops through the
full-U-Net (zoo.Unet, embeds=True -> the pre-upsample u0 feature map),
projects every embed pixel to 2-D, scatter-plots them colored by the
predicted mask with the tree-crop embeds overlaid as "+" markers, then
back-projects a 2-D half-plane selection onto the frames as
mask-agreement panels (:1664-1686).

Projection: `umap.UMAP(random_state=42)` when the optional `umap`
package is importable (the reference's choice, :1652); otherwise a
PCA (top-2 SVD) projection computed on device — same
fit-on-frames / transform-tree-crops protocol, documented fallback
(this env ships no umap).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from matplotlib.colors import hsv_to_rgb


def resize_bilinear(arr: np.ndarray,
                    hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (height, width) — the shared
    transforms.Resize / cv2.resize stand-in for the viz family (note
    cv2 itself takes (width, height); this wrapper fixes the (h, w)
    convention once)."""
    import cv2
    return cv2.resize(arr.astype(np.float32), (hw[1], hw[0]),
                      interpolation=cv2.INTER_LINEAR)


_resize = resize_bilinear  # internal call sites below


class _PCAProjector:
    """Top-2-component PCA with umap's fit_transform/transform API."""

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        xj = jnp.asarray(x, jnp.float32)
        self.mean = jnp.mean(xj, axis=0)
        _, _, vt = jnp.linalg.svd(xj - self.mean, full_matrices=False)
        self.components = vt[:2].T                       # (D, 2)
        return np.asarray((xj - self.mean) @ self.components)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(
            (jnp.asarray(x, jnp.float32) - self.mean)
            @ self.components)


def _make_projector():
    try:
        import umap                                      # noqa: F401
        return umap.UMAP(random_state=42)                # :1652
    except ImportError:
        return _PCAProjector()


def load_tree_crops(tree_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """TrainHandler.py:1606-1625: read RGBA crop images whose names
    contain 'w' or 'b'; alpha==255 marks the object with label idx+1,
    labels > 5 zeroed; colors go to HSV."""
    import cv2
    names = [n for n in sorted(os.listdir(tree_dir))
             if "w" in n or "b" in n]
    xs, ys = [], []
    for idx, name in enumerate(names):
        path = os.path.join(tree_dir, name)
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise ValueError(f"unreadable crop image: {path}")
        if img.ndim != 3 or img.shape[2] != 4:
            # without an alpha plane img[:, :, -1] would silently use
            # the red channel as the object-label mask
            raise ValueError(
                f"{path}: expected RGBA (alpha marks the object), got "
                f"shape {img.shape}")
        y = img[:, :, -1].astype(np.int64)
        y[y == 255] = idx + 1
        x = cv2.cvtColor(img[:, :, :3],
                         cv2.COLOR_BGR2HSV).astype(np.float32)
        xs.append(x)
        ys.append(y)
    tree_y = np.stack(ys, axis=0)
    tree_y[tree_y > 5] = 0
    return np.stack(xs, axis=0), tree_y


def vis_unet_embeddings(unet, params, frames: np.ndarray,
                        tree_x: np.ndarray, tree_y: np.ndarray,
                        out_dir: str, n_samples: int = 10,
                        sel_threshold: float | None = None,
                        seed: int = 42) -> dict:
    """Run the visualization; returns {'plot', 'frames', 'selection'}.

    frames: (N, 64, 64, 3) HSV uint8-range floats — fed to the net
    UN-scaled exactly like the reference (TrainHandler.py:1627:
    `T.from_numpy(raw_batch).float()`, no /255; the /255 happens only
    for the RGB rendering, :1736). tree_x/tree_y per
    :func:`load_tree_crops`. sel_threshold is the 2-D half-plane cut
    (the reference hardcodes `x > 15` in its fitted umap space,
    :1666); default = 90th percentile of the projected x coordinate.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)                    # :1598
    sidxs = rng.choice(np.arange(len(frames)), n_samples)
    raw_batch = np.asarray(frames, np.float32)[sidxs]

    @jax.jit
    def forward(p, x):
        return unet.apply({"params": p}, x, embeds=True)

    mask, embeds = forward(params, jnp.asarray(raw_batch))
    tmask, tembeds = forward(params, jnp.asarray(tree_x, jnp.float32))
    mask, embeds = np.asarray(mask), np.asarray(embeds)
    tmask, tembeds = np.asarray(tmask), np.asarray(tembeds)
    eh, ew = embeds.shape[1:3]

    flat_mask = np.stack([_resize(m[..., 0], (eh, ew))
                          for m in mask]).reshape(-1)
    flat_treey = np.stack([
        _resize(y.astype(np.float32), (eh, ew))
        for y in tree_y]).reshape(-1).round()
    flat_embeds = embeds.reshape(-1, embeds.shape[-1])
    flat_tembeds = tembeds.reshape(-1, tembeds.shape[-1])

    projector = _make_projector()
    standard = projector.fit_transform(flat_embeds)
    tree_pts = projector.transform(flat_tembeds)
    keep = flat_treey > 0
    tree_pts, treey_color = tree_pts[keep], flat_treey[keep]
    x, y = standard[:, 0], standard[:, 1]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure()
    plt.scatter(x, y, c=flat_mask, s=0.1)
    if len(tree_pts):
        plt.scatter(tree_pts[:, 0], tree_pts[:, 1], marker="+", s=0.1,
                    c=treey_color, cmap="cool")
    plot_path = os.path.join(out_dir, "umap-plot.png")
    plt.savefig(plot_path, dpi=300)
    plt.close()

    if sel_threshold is None:
        sel_threshold = float(np.quantile(x, 0.9))
    flat_selection = x > sel_threshold                   # :1666
    batch_selection = flat_selection.reshape(n_samples, eh, ew)
    resized_sel = np.stack([
        _resize(s.astype(np.float32), raw_batch.shape[1:3])
        for s in batch_selection])[..., None]

    batch_mask = (np.ones_like(raw_batch) * resized_sel
                  * (mask > 0.5))
    batch_mask_2 = (np.ones_like(raw_batch) * resized_sel
                    * (mask < 0.5))
    rgb_batch = hsv_to_rgb(raw_batch / 255)
    masked = batch_mask * rgb_batch
    masked_2 = batch_mask_2 * rgb_batch

    frame_paths = []
    for idx, frame in enumerate(masked):
        img = np.concatenate(
            (rgb_batch[idx], frame, batch_mask[idx], masked_2[idx],
             batch_mask_2[idx]), axis=1)
        p = os.path.join(out_dir, f"{idx}.png")
        from PIL import Image
        Image.fromarray(
            np.uint8(255 * np.clip(img, 0, 1))).save(p)
        frame_paths.append(p)
    return {"plot": plot_path, "frames": frame_paths,
            "selection": batch_selection}


def vis_unet(unet, params, frames: np.ndarray, out_dir: str,
             online: bool = False, batchsize: int = 512,
             scale: int = 6) -> str:
    """TrainHandler.py:2652-2720: run the full U-Net over an HSV frame
    stream (offline = dataset frames + navigation negatives; online =
    frames decoded from a clip — the caller supplies either) and write
    the 3-panel result video [pov | mask-weighted rgb | mask], each
    panel 1-px padded and the strip NN-upscaled `scale`x
    (:2705-2718). Returns the video path (`offline-eval.mp4` /
    `online-eval.mp4`; the reference writes XVID .avi).

    Frames are fed to the net in the reference's unscaled 0-255 HSV
    range (:2696: `T.from_numpy(...)` with no /255) while the RGB
    panels render from frames/255 (:2701)."""
    os.makedirs(out_dir, exist_ok=True)
    x = np.asarray(frames, np.float32)

    @jax.jit
    def forward(p, batch):
        return unet.apply({"params": p}, batch)

    masks = []
    for bidx in range(0, len(x), batchsize):
        m = forward(params, jnp.asarray(x[bidx:bidx + batchsize]))
        masks.append(np.asarray(m))
    masks = np.concatenate(masks, axis=0)

    rgb = hsv_to_rgb(x / 255) * 255
    pad = lambda a, v: np.pad(a, ((1, 1), (1, 1), (0, 0)),  # noqa: E731
                              mode="constant", constant_values=v)
    strips = []
    for idx, mask in enumerate(masks):
        m = np.ones(rgb[idx].shape) * mask
        masked_rgb = rgb[idx] * m
        pic = np.concatenate(
            (pad(rgb[idx], 125), pad(masked_rgb, 125),
             pad(255 * m, 0.5 * 255)), axis=1)
        pic = np.kron(pic, np.ones((scale, scale, 1)))  # NN upscale
        strips.append(np.clip(pic, 0, 255).astype(np.uint8))
    name = "online-eval.mp4" if online else "offline-eval.mp4"
    path = os.path.join(out_dir, name)
    from cgs_tpu.utils.video import vidwrite
    vidwrite(path, np.stack(strips), framerate=20)
    return path
