"""Synthetic reward-segmentation fixture.

The reference trains on the 60 GB MineRL Treechop imitation dataset
(main.py:1287-1290), which is neither shippable nor downloadable here.
This module generates a procedurally equivalent task so the full
two-phase pipeline runs end-to-end in seconds and IoU has a known
oracle (SURVEY.md §4 item 3):

  * 64x64 RGB frames: textured green/brown noise background;
  * the "rewarding object" is a vertical red-brown trunk whose width
    grows as the agent approaches; reward fires when the trunk is
    chopped (trunk present for a few frames, then disappears with
    reward=1 on the final contact frame);
  * ground-truth masks are the trunk footprint — training never sees
    them (the invariant of the reference, SURVEY.md §3.5).

Same (X, Y, I) contract as the MineRL collector: X uint8 (N,64,64,3),
Y float32 (7,N) with row 0 = binary reward and rows 1-4 discounted at
gammas, I uint16 frame-in-episode indices.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from cgs_tpu.ops.discount import build_label_matrix


def _trunk_mask(width: int, center: int, trunk_w: int) -> np.ndarray:
    m = np.zeros((width, width), bool)
    lo = max(0, center - trunk_w // 2)
    hi = min(width, center + (trunk_w + 1) // 2)
    m[8:, lo:hi] = True  # trunk spans most of the frame height
    return m


def _render(rng: np.random.Generator, mask: np.ndarray) -> np.ndarray:
    w = mask.shape[0]
    frame = np.empty((w, w, 3), np.uint8)
    # grass/sky-ish noisy background (red channel kept low so the
    # trunk's red signature is linearly separable — the fixture must be
    # learnable within a few hundred critic steps)
    base = np.stack([rng.integers(30, 70, (w, w)),
                     rng.integers(90, 160, (w, w)),
                     rng.integers(40, 90, (w, w))], axis=-1)
    frame[:] = base
    # trunk: saturated red-brown, clearly separated from background
    trunk = np.stack([rng.integers(190, 220, (w, w)),
                      rng.integers(50, 70, (w, w)),
                      rng.integers(30, 50, (w, w))], axis=-1)
    frame[mask] = trunk[mask].astype(np.uint8)
    return frame


def synthetic_episode(rng: np.random.Generator, length: int = 600,
                      width: int = 64):
    """One episode: wander (no trunk) -> approach (growing trunk) ->
    chop (reward) -> wander. Returns (frames, rewards, gt_masks).

    Reward spacing is tuned so the gamma=0.98 discounted labels span
    the full [0, 1] range like trunk-filtered Treechop data: trunkless
    wander frames average value ~0.2 < --low-rew-thresh (0.3), visible
    trunk frames approach 1.0 > --high-rew-thresh (0.7) — so the
    critic's appearance->value mapping induces a clean pos/neg split
    (main.py:266-281)."""
    frames = np.empty((length, width, width, 3), np.uint8)
    rewards = np.zeros(length, np.float32)
    masks = np.zeros((length, width, width), bool)
    t = 0
    while t < length:
        wander = int(rng.integers(120, 180))
        for _ in range(min(wander, length - t)):
            frames[t] = _render(rng, np.zeros((width, width), bool))
            t += 1
        if t >= length:
            break
        approach = int(rng.integers(20, 30))
        center = int(rng.integers(16, width - 16))
        n = min(approach, length - t)  # fixed BEFORE t advances: the
        # reward must land on the final emitted approach frame even
        # when the episode truncates the approach
        for i in range(n):
            trunk_w = 3 + int(12 * i / approach)
            m = _trunk_mask(width, center, trunk_w)
            frames[t] = _render(rng, m)
            masks[t] = m
            rewards[t] = 1.0 if i == n - 1 else 0.0
            t += 1
    return frames, rewards, masks


def synthetic_dataset(n_frames: int = 4000, seed: int = 0,
                      width: int = 64,
                      gammas=(0.98, 0.97, 0.96, 0.95),
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(X, Y, I) in the collect_data contract (main.py:1295-1297).
    gammas: discount factors for label rows 1-4 — collect_data passes
    the parsed --gammas like the MineRL collector does."""
    rng = np.random.default_rng(seed)
    X = np.zeros((n_frames, width, width, 3), np.uint8)
    Y = np.zeros((7, n_frames), np.float32)
    I = np.zeros(n_frames, np.uint16)
    t = 0
    while t < n_frames:
        frames, rewards, _ = synthetic_episode(rng, width=width)
        add = min(len(frames), n_frames - t)
        X[t:t + add] = frames[:add]
        Y[:, t:t + add] = np.asarray(
            build_label_matrix(rewards[:add], gammas))
        I[t:t + add] = np.arange(add)
        t += add
    return X, Y, I


def synthetic_eval_set(n_frames: int = 600, seed: int = 99,
                       width: int = 64):
    """Held-out labeled frames mirroring the red-trees eval contract
    (main.py:920-928): X uint8 (N,w,w,3), gt bool (N,w,w)."""
    rng = np.random.default_rng(seed)
    X = np.zeros((n_frames, width, width, 3), np.uint8)
    gt = np.zeros((n_frames, width, width), bool)
    t = 0
    while t < n_frames:
        frames, _, masks = synthetic_episode(rng, width=width)
        add = min(len(frames), n_frames - t)
        X[t:t + add] = frames[:add]
        gt[t:t + add] = masks[:add]
        t += add
    return X, gt
