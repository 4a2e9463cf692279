"""Patch-embedding clusters with per-cluster tree probability
(reference `create_patch_embedding_clusters`, TrainHandler.py:2161-2291,
and the `PatchEmbedder` consumer surface used at
TrainHandler.py:2173-2176,2232-2234,2283-2288,2355-2357).

The upstream `isy_minerl.segm.PatchEmbedder` module is ABSENT from the
reference repo (TrainHandler.py:27 imports it and fails), so this file
reconstructs it from its complete call surface:

  * ``pixel_clusters`` — a GMM over (sub-sampled) pixel colors
    (TrainHandler.py:2228-2231: ``GMM(n_components=embed_dim).fit``)
  * ``embed_batch(X) -> (flat_embeds, pshape)`` — per-patch embeddings
    of dimension ``embed_dim`` (TrainHandler.py:2234)
  * ``patch_embed_clusters`` — KMeans over patch embeds
    (TrainHandler.py:2253-2256)
  * ``patch_embed_cluster_tree_probs`` — the 4-column per-cluster
    tree-probability table (TrainHandler.py:2266-2281)
  * ``predict_batch(X) -> (probs, labels)`` (TrainHandler.py:2356)
  * ``save/load_embed_tuple`` with the 7-tuple pickle layout
    (TrainHandler.py:2287-2288, 2313-2314)
  * ``convert_treshold``, ``patch_label_to_color``
    (TrainHandler.py:2316-2317, 2346-2350)

Given the GMM-pixel-cluster + ``embed_dim``-sized patch embedding, the
natural (and only shape-consistent) embedding is the per-patch
histogram of pixel-cluster assignments — each patch becomes the
distribution of its pixels over the ``embed_dim`` GMM components.

TPU design: the whole embed path is one jitted program — diagonal
GMM log-likelihoods as a single (P, D)x(D, E) batched quadratic on the
MXU, hard assignment one-hot, and the patch histogram as a
``lax.reduce_window`` box sum (window pw, stride s) over the one-hot
channels. GMM fitting is EM as one ``lax.scan``; KMeans reuses
:func:`cgs_tpu.sandbox.cluster.kmeans` (also a scan).
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgs_tpu.sandbox.cluster import kmeans

Array = jnp.ndarray

_VAR_FLOOR = 1e-6


# ---------------------------------------------------------------------------
# Diagonal-covariance GMM (sklearn GMM stand-in, TrainHandler.py:2230)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _gmm_em(points: Array, n_components: int, iters: int,
            key: jax.Array) -> Dict[str, Array]:
    """EM for a diagonal GMM as one lax.scan program.

    points: (P, D) float32. Returns {'weights' (E,), 'means' (E, D),
    'vars' (E, D)}. Means initialize from KMeans (like sklearn's
    default init), variances from the global data variance.
    """
    p = points.astype(jnp.float32)
    means0, _ = kmeans(p, n_components, iters=10, key=key)
    var0 = jnp.maximum(jnp.var(p, axis=0), _VAR_FLOOR)
    init = {
        "weights": jnp.full((n_components,), 1.0 / n_components),
        "means": means0,
        "vars": jnp.broadcast_to(var0, (n_components, p.shape[1])),
    }

    def log_prob(params):
        # (P, E): log N(x | mu_e, diag(var_e)) + log w_e
        inv = 1.0 / params["vars"]                      # (E, D)
        # ||x - mu||^2_inv = x^2.inv - 2 x.(mu*inv) + mu^2.inv  -> MXU
        quad = (p ** 2) @ inv.T - 2.0 * (p @ (params["means"] * inv).T)
        quad = quad + jnp.sum(params["means"] ** 2 * inv, axis=1)
        logdet = jnp.sum(jnp.log(params["vars"]), axis=1)
        d = p.shape[1]
        return (-0.5 * (quad + logdet + d * jnp.log(2 * jnp.pi))
                + jnp.log(params["weights"]))

    def body(params, _):
        lp = log_prob(params)
        resp = jax.nn.softmax(lp, axis=1)               # (P, E)
        nk = jnp.maximum(resp.sum(axis=0), 1e-10)       # (E,)
        means = (resp.T @ p) / nk[:, None]
        ex2 = (resp.T @ (p ** 2)) / nk[:, None]
        var = jnp.maximum(ex2 - means ** 2, _VAR_FLOOR)
        weights = nk / p.shape[0]
        return {"weights": weights, "means": means, "vars": var}, None

    params, _ = jax.lax.scan(body, init, None, length=iters)
    return params


def gmm_fit(points: np.ndarray, n_components: int, iters: int = 30,
            seed: int = 0) -> Dict[str, np.ndarray]:
    """Fit a diagonal GMM; returns numpy params."""
    out = _gmm_em(jnp.asarray(points, jnp.float32), n_components,
                  iters, jax.random.PRNGKey(seed))
    return {k: np.asarray(v) for k, v in out.items()}


def gmm_assign(params: Dict[str, np.ndarray], points: Array) -> Array:
    """Hard component assignment (argmax posterior), jit-safe."""
    p = jnp.asarray(points, jnp.float32)
    means = jnp.asarray(params["means"])
    var = jnp.asarray(params["vars"])
    w = jnp.asarray(params["weights"])
    inv = 1.0 / var
    quad = (p ** 2) @ inv.T - 2.0 * (p @ (means * inv).T)
    quad = quad + jnp.sum(means ** 2 * inv, axis=1)
    logdet = jnp.sum(jnp.log(var), axis=1)
    return jnp.argmax(-0.5 * (quad + logdet) + jnp.log(w), axis=1)


# ---------------------------------------------------------------------------
# PatchEmbedder
# ---------------------------------------------------------------------------

def channels_for(hue: bool = False, hsv: bool = False) -> List[int]:
    """Channel selection (TrainHandler.py:2171):
    -hue -> [0], -hsv -> [0,1,2], default -> [0,1] (hue+saturation)."""
    return [0] if hue else ([0, 1, 2] if hsv else [0, 1])


@dataclass
class PatchEmbedder:
    """Reconstruction of the missing upstream PatchEmbedder (see module
    docstring). Frames are HSV floats in [0, 1] shaped (B, H, W, 3),
    matching every call site (the reference converts with
    matplotlib rgb_to_hsv before embedding, TrainHandler.py:2224)."""

    embed_dim: int = 100          # --embed-dim (TrainHandler.py:4004)
    n_cluster: int = 100          # --embed-cluster (:4005)
    channels: Sequence[int] = (0, 1)
    pw: int = 10                  # --embed-patch-width (:4007)
    stride: int = 2               # hardcoded (TrainHandler.py:2166)
    norm: str = "raw"             # --embed-norm (:4009)

    pixel_clusters: Dict[str, np.ndarray] | None = None
    patch_embed_clusters: np.ndarray | None = None   # (K, E) centroids
    patch_embed_cluster_tree_probs: np.ndarray | None = None  # (K, 4)
    _embed_fn: object = field(default=None, repr=False)

    # ---- embedding -------------------------------------------------

    @property
    def w(self) -> int:
        """Patch width (saved in the embed tuple,
        TrainHandler.py:2287)."""
        return self.pw

    def _build_embed(self):
        pw, stride = self.pw, self.stride
        chans = tuple(self.channels)
        norm = self.norm
        pix = self.pixel_clusters
        e = self.embed_dim

        @jax.jit
        def embed(x):                        # (B, H, W, 3) HSV floats
            sel = x[..., jnp.asarray(chans)]
            flat = sel.reshape(-1, len(chans))
            labels = gmm_assign(pix, flat)
            one_hot = jax.nn.one_hot(labels, e, dtype=jnp.float32)
            grid = one_hot.reshape(x.shape[0], x.shape[1], x.shape[2],
                                   e)
            # per-patch histogram: box-sum over (pw, pw) windows
            counts = jax.lax.reduce_window(
                grid, 0.0, jax.lax.add, (1, pw, pw, 1),
                (1, stride, stride, 1), "VALID")
            if norm == "l1":
                counts = counts / jnp.maximum(
                    counts.sum(-1, keepdims=True), 1.0)
            elif norm == "l2":
                counts = counts / jnp.maximum(
                    jnp.linalg.norm(counts, axis=-1, keepdims=True),
                    1e-6)
            return counts                    # (B, ph, pw_n, E)

        return embed

    def embed_batch(self, x: np.ndarray
                    ) -> Tuple[np.ndarray, Tuple[int, ...]]:
        """(flat_embeds (B*ph*pwn, E), pshape (B, ph, pwn, E)) —
        the TrainHandler.py:2234 contract."""
        assert self.pixel_clusters is not None, "fit pixel GMM first"
        if self._embed_fn is None:
            self._embed_fn = self._build_embed()
        grid = np.asarray(self._embed_fn(jnp.asarray(x, jnp.float32)))
        pshape = grid.shape
        return grid.reshape(-1, self.embed_dim), pshape

    # ---- fitting (TrainHandler.py:2226-2281) -----------------------

    def fit(self, x: np.ndarray, y: np.ndarray, seed: int = 0,
            pixel_subsample: int = 10, embed_subsample: int = 5
            ) -> np.ndarray:
        """The create_patch_embedding_clusters math on a fused
        (frames, binary tree label) dataset. Returns the (K, 4)
        tree-probability table and stores all fitted state.

        Column semantics (TrainHandler.py:2270-2281):
          0: cluster positives / B      1: cluster size / B
          2: precision (max-normalized) 3: recall
        (columns 0/1 divide by len(labels) == the leading batch axis,
        a reference quirk preserved verbatim)."""
        pixels = x.reshape(-1, x.shape[-1])[::pixel_subsample]
        pixels = pixels[:, list(self.channels)]
        self.pixel_clusters = gmm_fit(pixels, self.embed_dim,
                                      seed=seed)
        self._embed_fn = None

        flat_embeds, pshape = self.embed_batch(x)
        centroids, _ = kmeans(jnp.asarray(flat_embeds[::embed_subsample]),
                              self.n_cluster,
                              key=jax.random.PRNGKey(seed + 1))
        self.patch_embed_clusters = np.asarray(centroids)
        flat_labels = np.asarray(self._assign_patches(flat_embeds))
        labels = flat_labels.reshape(pshape[0:3])

        # central-box GT on the patch grid (TrainHandler.py:2263-2269;
        # the /10 vs /3 axis mix is verbatim)
        shape = pshape[:3]
        gt = np.zeros(shape)
        xmid = shape[2] / 2
        ymid = shape[1] / 2
        xslice = slice(int(xmid - shape[1] / 10),
                       math.ceil(xmid + shape[1] / 10))
        yslice = slice(int(ymid - shape[2] / 3),
                       math.ceil(ymid + shape[2] / 3))
        gt[np.asarray(y) == 1, yslice, xslice] = 1
        flat_gt = gt.reshape(-1)

        tree_probs = np.zeros((self.n_cluster, 4))
        num_all_pos = np.sum(flat_gt)
        for idx in range(self.n_cluster):
            sel = flat_labels == idx
            num_pos = np.sum(flat_gt[sel])
            num_label = np.sum(sel)
            tree_probs[idx, 0] = num_pos / len(labels)
            tree_probs[idx, 1] = num_label / len(labels)
            # reference divides unguarded (nan for an empty cluster);
            # quirk policy (SURVEY §7.3): same ranking, no nan
            tree_probs[idx, 2] = num_pos / max(num_label, 1)
            tree_probs[idx, 3] = num_pos / max(num_all_pos, 1)
        tree_probs[:, 2] /= max(np.max(tree_probs[:, 2]), 1e-12)
        self.patch_embed_cluster_tree_probs = tree_probs
        return tree_probs

    def _assign_patches(self, flat_embeds: np.ndarray) -> Array:
        c = jnp.asarray(self.patch_embed_clusters)
        p = jnp.asarray(flat_embeds, jnp.float32)
        d2 = (jnp.sum(p ** 2, 1, keepdims=True) - 2.0 * (p @ c.T)
              + jnp.sum(c ** 2, 1))
        return jnp.argmin(d2, axis=1)

    # ---- prediction (TrainHandler.py:2356) -------------------------

    def predict_batch(self, x: np.ndarray, verbose: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """(probs (B, ph, pwn), labels (B, ph, pwn)): per-patch
        normalized tree precision and patch-cluster id."""
        assert self.patch_embed_clusters is not None
        flat_embeds, pshape = self.embed_batch(x)
        flat_labels = np.asarray(self._assign_patches(flat_embeds))
        labels = flat_labels.reshape(pshape[0:3])
        probs = self.patch_embed_cluster_tree_probs[:, 2][labels]
        return probs.astype(np.float32), labels

    def convert_treshold(self, t: float) -> float:
        """TrainHandler.py:2316. tree_probs[:, 2] is max-normalized in
        fit(), so a threshold on [0, 1] passes through unchanged (the
        upstream module is absent; this is the shape-consistent
        reconstruction)."""
        return float(t)

    def patch_label_to_color(self, label: int,
                             top: int = 3) -> np.ndarray:
        """Top pixel-cluster colors of a patch cluster
        (TrainHandler.py:2346-2350): the centroid histogram's heaviest
        GMM components rendered as an HSV swatch strip, (16, 16*top, 3)
        uint8 (missing channels filled with 1.0)."""
        centroid = self.patch_embed_clusters[label]
        order = np.argsort(centroid)[::-1][:top]
        swatches = []
        for comp in order:
            mean = self.pixel_clusters["means"][comp]
            hsv = np.ones(3, np.float32)
            for i, ch in enumerate(self.channels):
                hsv[ch] = mean[i]
            from matplotlib.colors import hsv_to_rgb
            rgb = hsv_to_rgb(np.clip(hsv, 0, 1))
            swatches.append(np.broadcast_to(rgb, (16, 16, 3)))
        strip = np.concatenate(swatches, axis=1)
        return (255 * strip).astype(np.uint8)

    # ---- persistence (TrainHandler.py:2287-2288) -------------------

    def save_embed_tuple(self, path: str) -> None:
        """The 7-tuple pickle layout of TrainHandler.py:2287-2288:
        (embed_clusters, tree_probs, embed_dim, pixel_clusters, w,
        channels, norm) — estimator objects stored as plain arrays."""
        with open(path, "wb") as fp:
            pickle.dump((self.patch_embed_clusters,
                         self.patch_embed_cluster_tree_probs,
                         self.embed_dim, self.pixel_clusters, self.w,
                         list(self.channels), self.norm), fp)

    def load_embed_tuple(self, path: str) -> "PatchEmbedder":
        with open(path, "rb") as fp:
            (clusters, probs, embed_dim, pixel_clusters, w, channels,
             norm) = pickle.load(fp)
        self.patch_embed_clusters = clusters
        self.patch_embed_cluster_tree_probs = probs
        self.embed_dim = embed_dim
        # the 7-tuple doesn't carry n_cluster explicitly; it IS the
        # centroid count (load must not keep the constructor default)
        self.n_cluster = int(clusters.shape[0])
        self.pixel_clusters = pixel_clusters
        self.pw = w
        self.channels = list(channels)
        self.norm = norm
        self._embed_fn = None
        return self


# ---------------------------------------------------------------------------
# The create_patch_embedding_clusters driver (TrainHandler.py:2161-2291)
# ---------------------------------------------------------------------------

def embed_data_args(embed_cluster: int = 100, embed_dim: int = 100,
                    embed_train_samples: int = 700, delay: int = 0,
                    embed_pos_threshold: float = 0.9,
                    embed_patch_width: int = 10, hue: bool = False,
                    hsv: bool = False, embed_norm: str = "raw") -> str:
    """The fingerprint filename stem (TrainHandler.py:205-208)."""
    color = "-hue" if hue else ("-hsv" if hsv else "-hs")
    return (f"cl{embed_cluster}-dim{embed_dim}-ds{embed_train_samples}"
            f"-dl{delay}-th{embed_pos_threshold}-pw{embed_patch_width}"
            f"{color}-{embed_norm}")


def fuse_datasets(tree_x: np.ndarray, tree_rewards: np.ndarray,
                  nav_x: np.ndarray, nav_y: np.ndarray,
                  n_samples: int, pos_threshold: float = 0.9,
                  seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Fuse high-reward treechop frames (label 1) with navigation
    negatives (TrainHandler.py:2192-2200). Inputs/outputs are HSV
    floats in [0, 1]; tree_rewards is the discounted reward row
    (reward_idx 4, TrainHandler.py:2169)."""
    rng = np.random.default_rng(seed)
    high = tree_rewards >= pos_threshold
    tx = tree_x[high]
    navsel = rng.integers(len(nav_x), size=n_samples)
    treesel = rng.integers(len(tx), size=n_samples)
    x = np.concatenate((tx[treesel], nav_x[navsel]), axis=0)
    y = np.concatenate((np.ones(n_samples), nav_y[navsel]), axis=0)
    return x, y


def create_patch_embedding_clusters(
        tree_x: np.ndarray, tree_rewards: np.ndarray,
        nav_x: np.ndarray, nav_y: np.ndarray, out_path: str,
        embed_dim: int = 100, n_clusters: int = 100,
        n_samples: int = 700, patch_width: int = 10, stride: int = 2,
        pos_threshold: float = 0.9, hue: bool = False,
        hsv: bool = False, norm: str = "raw", seed: int = 0
) -> PatchEmbedder:
    """End-to-end TrainHandler.py:2161-2291: fuse, fit pixel GMM +
    patch KMeans + tree probs, pickle the embed tuple to out_path."""
    x, y = fuse_datasets(tree_x, tree_rewards, nav_x, nav_y,
                         n_samples, pos_threshold, seed)
    emb = PatchEmbedder(embed_dim=embed_dim, n_cluster=n_clusters,
                        channels=channels_for(hue, hsv),
                        pw=patch_width, stride=stride, norm=norm)
    emb.fit(x, y, seed=seed)
    emb.save_embed_tuple(out_path)
    return emb
