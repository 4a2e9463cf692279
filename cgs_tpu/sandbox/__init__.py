"""Research-sandbox capabilities (SURVEY.md §2.4).

TPU-native equivalents of the runnable ideas in the reference's
`TrainHandler.py` experiment sandbox (which is itself not executable
upstream — it imports packages missing from that repo,
TrainHandler.py:8-9,27,30). Implemented here: TD(0) critic training,
the water-frame discriminator, gradient-ascent "dream" visualization,
sarsa frame-pair collection, multi-seed run aggregation, per-pixel
HSV KMeans clustering, the mask-area self-supervision experiment,
the dev reward-discount exploration, the patch-embedding
GMM/KMeans cluster family (a reconstruction of the PatchEmbedder
module that is missing upstream, TrainHandler.py:27) with its
vis_embed/vis_white_tree/vis_pixels artifacts, the VGG
cosine-similarity trans_embeds strips, and the U-Net embedding-space
projection (umap when installed, PCA fallback).
"""

from cgs_tpu.sandbox.td_critic import make_td_critic_step, sarsa_pairs  # noqa: F401
from cgs_tpu.sandbox.discriminator import make_discriminator_step  # noqa: F401
from cgs_tpu.sandbox.dream import dream  # noqa: F401
from cgs_tpu.sandbox.multirun import run_seeds  # noqa: F401
from cgs_tpu.sandbox.cluster import cluster_frames, kmeans, rgb_to_hsv  # noqa: F401
from cgs_tpu.sandbox.sum_segm import sum_segm_loss, train_sum_segm  # noqa: F401
from cgs_tpu.sandbox.dev import dev, dev_discount_row, dev_label_matrix  # noqa: F401
from cgs_tpu.sandbox.patch_embed import (  # noqa: F401
    PatchEmbedder, create_patch_embedding_clusters, gmm_fit)
from cgs_tpu.sandbox.embed_viz import vis_embed, vis_pixels, vis_white_tree  # noqa: F401
from cgs_tpu.sandbox.trans_embeds import trans_embeds  # noqa: F401
from cgs_tpu.sandbox.unet_embeddings import vis_unet, vis_unet_embeddings  # noqa: F401
from cgs_tpu.sandbox.merge_variants import (  # noqa: F401
    distnorm_loss, make_pair_merge_step, make_single_net_merge_step,
    percentile_split)
