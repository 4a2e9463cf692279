"""Reward-discount exploration (reference `dev`,
TrainHandler.py:3693-3785): build six discount-variant label rows over
the pre-first-reward prefix of each episode — three plain backward
discounts (gamma 0.99/0.98/0.97) and three "nonrew" variants that give
every non-reward frame a -1 penalty accumulated backward with gamma
0.99/0.95/0.90 (reward frames pinned at 0) — then pickle the (7, N)
matrix and plot a 2x2 histogram figure.

The backward recursions run as one `jax.lax.scan` per variant
(vectorized over variants would be possible but the host loop is six
iterations — clarity wins)."""

from __future__ import annotations

import gzip
import pickle
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (gamma, nonrew) pairs, TrainHandler.py:3745-3746
DEV_SPECS: Tuple[Tuple[float, int], ...] = (
    (0.99, 0), (0.98, 0), (0.97, 0),
    (0.99, -1), (0.95, -1), (0.90, -1),
)


def dev_discount_row(reward: np.ndarray, gamma: float,
                     nonrew: int = 0) -> np.ndarray:
    """One variant row. nonrew=0: plain backward discount
    r[t] += gamma * r[t+1] (uncapped, unlike the production
    collector's min(.,1) — TrainHandler.py:3757-3762 has no cap).
    nonrew=-1: non-reward frames start at -1 and accumulate
    gamma-discounted penalty backward; reward frames stay 0
    (TrainHandler.py:3749-3755)."""
    reward = (np.asarray(reward) > 0).astype(np.float32)
    if nonrew:
        base = jnp.asarray((reward <= 0) * float(nonrew), jnp.float32)

        def body(nxt, cur):
            val = jnp.where(cur == 0, 0.0, cur + gamma * nxt)
            return val, val
    else:
        base = jnp.asarray(reward, jnp.float32)

        def body(nxt, cur):
            val = cur + gamma * nxt
            return val, val

    _, rows = jax.lax.scan(body, jnp.float32(0.0), base, reverse=True)
    return np.asarray(rows)


def dev_label_matrix(rewards: Sequence[np.ndarray],
                     size: int) -> np.ndarray:
    """(7, size) matrix: row 0 stays zero like the reference (its X/Y
    row-0 writes are commented out, TrainHandler.py:3735-3737); rows
    1-6 carry the DEV_SPECS variants over begin-prefix episodes,
    concatenated until `size` frames."""
    y = np.zeros((7, size), np.float32)
    runidx = 0
    for reward in rewards:
        reward = np.asarray(reward)
        add = min(size - runidx, len(reward))
        reward = reward[:add]
        # begin-prefix: frames until (and including) the first reward
        if (reward > 0).any():
            add = int(np.argmax(reward > 0)) + 1
            reward = reward[:add]
        for row, (gamma, nonrew) in enumerate(DEV_SPECS):
            y[row + 1, runidx:runidx + add] = dev_discount_row(
                reward, gamma, nonrew)
        runidx += add
        if runidx >= size:
            break
    return y


def dev(rewards: Sequence[np.ndarray], size: int, out_pickle: str,
        out_png: str = "") -> np.ndarray:
    """Full dev() artifact pass: gzip-pickle Y and the 2x2 histogram
    figure (raw / 0.99 / 0.98 / 0.97 — TrainHandler.py:3771-3783;
    plt.show() becomes a savefig)."""
    y = dev_label_matrix(rewards, size)
    with gzip.GzipFile(out_pickle, "wb") as fp:
        pickle.dump(y, fp)
    if out_png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(2, 2, sharex=True, sharey=True)
        for ax, (row, title) in zip(
                axs.flat, [(0, "raw reward"), (1, "discount 0.99"),
                           (2, "discount 0.98"), (3, "discount 0.97")]):
            ax.hist(y[row])
            ax.set_title(title)
        fig.savefig(out_png)
        plt.close(fig)
    return y
