"""Per-pixel HSV KMeans clustering (reference `cluster`,
TrainHandler.py:1995-2141): cluster every pixel of a frame batch in a
scaled (hue, saturation) space, score each cluster by its overlap with
the hand-drawn tree box `treemask[21:42, 25:39]` on reward frames
(TrainHandler.py:2007-2008,2066-2070), and pick the argmax cluster as
the "tree" cluster. The reference pickles `(kmeans, targetcluster)`
(TrainHandler.py:2108-2110) and can dump per-frame boolean cluster
layers keyed by k (TrainHandler.py:2116-2141).

TPU design: KMeans is Lloyd's algorithm as ONE `lax.scan` program
(distance matrix on the MXU via a single (P,2)x(2,K) expansion per
iteration) instead of sklearn's host loop; HSV conversion is jnp
elementwise math."""

from __future__ import annotations

import gzip
import pickle
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def rgb_to_hsv(rgb: Array) -> Array:
    """Vectorized RGB->HSV on [0,1] floats (matplotlib.colors
    semantics; the reference round-trips through
    matplotlib.colors.rgb_to_hsv on uint8/255)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0,
                                                    maxc))
    return jnp.stack([h, s, maxc], axis=-1)


def default_treemask() -> np.ndarray:
    """The hand-drawn tree box (TrainHandler.py:2007-2008)."""
    m = np.zeros((64, 64), np.uint8)
    m[21:42, 25:39] = 1
    return m


def kmeans(points: Array, k: int, iters: int = 25,
           key: jax.Array | None = None
           ) -> Tuple[Array, Array]:
    """Lloyd's KMeans on (P, D) points -> (centroids (k, D),
    labels (P,)). One lax.scan program; ties go to the lowest index
    like sklearn. Empty clusters keep their previous centroid."""
    key = key if key is not None else jax.random.PRNGKey(0)
    init_idx = jax.random.choice(key, points.shape[0], (k,),
                                 replace=False)
    init = points[init_idx]

    def assign(centroids):
        # quadratic form ||x||^2 - 2xC^T + ||c||^2 (the same MXU
        # expansion patch_embed._assign_patches uses): (P, K) memory
        # instead of materializing the (P, K, D) broadcast difference
        # — at per-pixel scale (16M pixels, K=20) that tensor is
        # ~2.7 GB per scan iteration
        d2 = (jnp.sum(points * points, axis=1, keepdims=True)
              - 2.0 * points @ centroids.T
              + jnp.sum(centroids * centroids, axis=1)[None])
        return jnp.argmin(d2, axis=1)

    def body(centroids, _):
        labels = assign(centroids)
        one_hot = jax.nn.one_hot(labels, k, dtype=points.dtype)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ points
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(body, init, None, length=iters)
    return centroids, assign(centroids)


def cluster_frames(x_u8: np.ndarray, y: np.ndarray, n_clusters: int,
                   treemask: np.ndarray | None = None,
                   color: str = "RGB", iters: int = 25,
                   seed: int = 0) -> Dict:
    """The reference's per-batch clustering pass.

    x_u8: (B, 64, 64, 3) uint8 frames; y: (B,) binary reward labels.
    Pixels are embedded as (hue, 0.1*saturation)
    (TrainHandler.py:2034-2038: channels [0,1], /255, s *= 0.1), then
    KMeans'd; each cluster's value = fraction of its pixels on reward
    frames that fall inside the tree box (TrainHandler.py:2066-2070).

    Returns {labels (B,64,64), layers (B,k,64,64) uint8, values (k,),
    target (int), centroids}."""
    treemask = default_treemask() if treemask is None else treemask
    x = jnp.asarray(x_u8, jnp.float32) / 255.0
    hsv = rgb_to_hsv(x) if color == "RGB" else x
    pixels = hsv[..., :2].reshape(-1, 2)
    pixels = pixels.at[:, 1].mul(0.1)

    centroids, flat_labels = kmeans(pixels, n_clusters, iters=iters,
                                    key=jax.random.PRNGKey(seed))
    labels = np.asarray(flat_labels).reshape(x_u8.shape[:-1])

    rew = np.asarray(y) == 1
    tm = treemask.astype(np.float64)
    values = []
    for c in range(n_clusters):
        sel = labels[rew] == c
        denom = sel.sum()
        # reference divides unguarded (nan for an empty cluster);
        # quirk policy: same ranking, no nan
        values.append(float((sel * tm).sum() / max(denom, 1)))
    layers = np.stack([(labels == c) for c in range(n_clusters)],
                      axis=1).astype(np.uint8)
    return {
        "labels": labels,
        "layers": layers,
        "values": np.asarray(values),
        "target": int(np.argmax(values)),
        "centroids": np.asarray(centroids),
    }


def save_kmeans(path: str, centroids: np.ndarray, target: int) -> None:
    """(kmeans, targetcluster) pickle (TrainHandler.py:2108-2110);
    we store the centroid array instead of an sklearn estimator."""
    with open(path, "wb") as fp:
        pickle.dump((centroids, target), fp)


def save_cluster_layers(path: str, layers: np.ndarray) -> None:
    """Gzip per-frame boolean cluster layers, the `-clustersave`
    dataset the old `segment` path consumed via `-clustercritic`
    (TrainHandler.py:2116-2141,1910-1912)."""
    with gzip.GzipFile(path, "wb") as fp:
        pickle.dump(layers, fp)
