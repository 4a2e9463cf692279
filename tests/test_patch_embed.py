"""Patch-embedding family (reference TrainHandler.py:2161-2291 and the
vis drivers :1423-1520, :1592-1686, :2293-2382, :2722-2851)."""

import numpy as np
import pytest

from cgs_tpu.sandbox.patch_embed import (
    PatchEmbedder, channels_for, create_patch_embedding_clusters,
    embed_data_args, fuse_datasets, gmm_assign, gmm_fit)


@pytest.fixture(scope="module")
def tree_nav():
    """Synthetic HSV fused dataset: tree frames carry a distinct-hue
    central bar; nav frames are dark noise."""
    rng = np.random.default_rng(0)
    b = 24
    tree = rng.random((b, 64, 64, 3)).astype(np.float32) * 0.2 + 0.6
    tree[:, 10:54, 26:39, 0] = 0.08
    tree[:, 10:54, 26:39, 1] = 0.9
    nav = rng.random((b, 64, 64, 3)).astype(np.float32) * 0.2
    return tree, np.ones(b), nav, np.zeros(b)


@pytest.fixture(scope="module")
def fitted(tree_nav, tmp_path_factory):
    tree, rew, nav, navy = tree_nav
    path = tmp_path_factory.mktemp("embed") / "tuple.pickle"
    emb = create_patch_embedding_clusters(
        tree, rew, nav, navy, str(path), embed_dim=8, n_clusters=8,
        n_samples=16, patch_width=10, stride=2)
    return emb, str(path)


def test_gmm_recovers_separated_blobs():
    rng = np.random.default_rng(1)
    pts = np.concatenate([rng.normal(0, 0.05, (200, 2)),
                          rng.normal(1, 0.05, (200, 2))]
                         ).astype(np.float32)
    params = gmm_fit(pts, 2, seed=0)
    lab = np.asarray(gmm_assign(params, pts))
    assert len(set(lab[:200])) == 1
    assert len(set(lab[200:])) == 1
    assert lab[0] != lab[-1]
    assert np.isclose(params["weights"].sum(), 1.0, atol=1e-5)


def test_channels_for_matches_reference_dispatch():
    # TrainHandler.py:2171
    assert channels_for(hue=True) == [0]
    assert channels_for(hsv=True) == [0, 1, 2]
    assert channels_for() == [0, 1]


def test_embed_data_args_fingerprint():
    # TrainHandler.py:205-208
    assert embed_data_args() == ("cl100-dim100-ds700-dl0-th0.9-pw10"
                                 "-hs-raw")
    assert embed_data_args(hue=True).endswith("-hue-raw")


def test_fuse_datasets_labels_and_threshold(tree_nav):
    tree, rew, nav, navy = tree_nav
    rew = rew.copy()
    rew[:4] = 0.0  # below the 0.9 positive threshold
    x, y = fuse_datasets(tree, rew, nav, navy, n_samples=8)
    assert x.shape == (16, 64, 64, 3)
    assert (y[:8] == 1).all() and (y[8:] == 0).all()


def test_embed_batch_shapes_and_histogram(fitted, tree_nav):
    emb, _ = fitted
    tree = tree_nav[0]
    flat, pshape = emb.embed_batch(tree[:3])
    n = (64 - emb.pw) // emb.stride + 1
    assert pshape == (3, n, n, emb.embed_dim)
    assert flat.shape == (3 * n * n, emb.embed_dim)
    # raw norm: every histogram sums to the patch pixel count
    assert np.allclose(flat.sum(-1), emb.pw * emb.pw)


def test_tree_probs_table_semantics(fitted):
    emb, _ = fitted
    probs = emb.patch_embed_cluster_tree_probs
    assert probs.shape == (8, 4)
    assert np.isclose(probs[:, 2].max(), 1.0)  # max-normalized
    assert (probs >= 0).all()
    assert probs[:, 3].sum() <= 1.0 + 1e-6  # recall partitions


def test_predict_separates_tree_from_nav(fitted, tree_nav):
    emb, _ = fitted
    tree, _, nav, _ = tree_nav
    tp, tl = emb.predict_batch(tree[:4])
    np_, _ = emb.predict_batch(nav[:4])
    assert tp.shape == tl.shape == (4, 28, 28)
    assert tp[:, 10:20, 10:18].mean() > np_.mean() + 0.3


def test_embed_tuple_roundtrip(fitted, tree_nav):
    emb, path = fitted
    tree = tree_nav[0]
    p1, l1 = emb.predict_batch(tree[:2])
    emb2 = PatchEmbedder().load_embed_tuple(path)
    assert emb2.embed_dim == emb.embed_dim
    assert emb2.pw == emb.pw
    p2, l2 = emb2.predict_batch(tree[:2])
    assert np.allclose(p1, p2)
    assert (l1 == l2).all()


def test_patch_label_to_color_swatch(fitted):
    emb, _ = fitted
    sw = emb.patch_label_to_color(0, top=3)
    assert sw.shape == (16, 48, 3) and sw.dtype == np.uint8


def test_vis_embed_and_white_tree(fitted, tree_nav, tmp_path):
    from cgs_tpu.sandbox.embed_viz import vis_embed, vis_white_tree
    emb, _ = fitted
    tree, _, nav, _ = tree_nav
    frames = np.concatenate([tree[:6], nav[:6]])
    video = vis_embed(emb, frames, str(tmp_path), "res")
    assert video.endswith("res.mp4")
    import os
    assert os.path.getsize(video) > 0

    out = vis_white_tree(emb, frames, str(tmp_path), "wt",
                         ref_index=0)
    assert os.path.getsize(out["video"]) > 0
    assert len(out["swatches"]) == 3
    assert len(out["labelset"]) == 3
    # per-frame PNGs written
    assert os.path.exists(str(tmp_path / "wt" / "0.png"))


def test_vis_pixels_writes_figure(tree_nav, tmp_path):
    from cgs_tpu.sandbox.embed_viz import vis_pixels
    tree = (tree_nav[0] * 255).astype(np.uint8)
    png = vis_pixels(tree[:4], str(tmp_path / "pix.png"),
                     n_components=5, subsample=50)
    import os
    assert os.path.getsize(png) > 0


def test_trans_embeds_strip(tmp_path):
    from cgs_tpu.sandbox.trans_embeds import trans_embeds
    rng = np.random.default_rng(0)
    frames = rng.random((5, 64, 64, 3)).astype(np.float32)
    png = trans_embeds(frames, str(tmp_path), interval=128, step=64,
                       max_scopes=2)
    assert png.endswith("i128-s64.png")
    from PIL import Image
    img = Image.open(png)
    # 1 RGB row + 2 scopes x (6 sim rows + 10px spacer)
    assert img.height == 64 + 2 * (6 * 64 + 10)
    assert img.width == 5 * 64


def test_vis_unet_embeddings_pca_fallback(tmp_path):
    import jax
    from cgs_tpu.models.zoo import Unet
    from cgs_tpu.sandbox.unet_embeddings import vis_unet_embeddings

    rng = np.random.default_rng(0)
    frames = rng.random((12, 64, 64, 3)).astype(np.float32) * 255
    tree_x = rng.random((2, 64, 64, 3)).astype(np.float32) * 255
    tree_y = np.zeros((2, 64, 64), np.int64)
    tree_y[:, 20:40, 28:36] = 1

    unet = Unet()
    params = unet.init(jax.random.PRNGKey(0),
                       np.zeros((1, 64, 64, 3), np.float32),
                       embeds=True)["params"]
    out = vis_unet_embeddings(unet, params, frames, tree_x, tree_y,
                              str(tmp_path), n_samples=4)
    import os
    assert os.path.getsize(out["plot"]) > 0
    assert len(out["frames"]) == 4
    assert out["selection"].shape[0] == 4
    # the half-plane cut selects ~10% of embed pixels by default
    frac = out["selection"].mean()
    assert 0.01 < frac < 0.3


def test_vis_unet_video(tmp_path):
    import os

    import jax
    from cgs_tpu.models.zoo import Unet
    from cgs_tpu.sandbox.unet_embeddings import vis_unet

    rng = np.random.default_rng(0)
    frames = rng.random((6, 64, 64, 3)).astype(np.float32) * 255
    unet = Unet()
    params = unet.init(jax.random.PRNGKey(0),
                       np.zeros((1, 64, 64, 3), np.float32))["params"]
    path = vis_unet(unet, params, frames, str(tmp_path), scale=2)
    assert path.endswith("offline-eval.mp4")
    assert os.path.getsize(path) > 0
    online = vis_unet(unet, params, frames, str(tmp_path),
                      online=True, scale=2)
    assert online.endswith("online-eval.mp4")


def test_embed_tuple_restores_n_cluster(fitted):
    """load_embed_tuple must not keep the constructor default
    n_cluster=100 (vis_white_tree indexes clusters by it)."""
    _, path = fitted
    emb2 = PatchEmbedder().load_embed_tuple(path)
    assert emb2.n_cluster == emb2.patch_embed_clusters.shape[0] == 8
