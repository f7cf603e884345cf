"""Full-rank alignment evaluation — device-side, no per-row host loop.

The reference evaluator (SNAG_MMEA/main.py:359-455) builds the full
N_test^2 distance matrix, then python-loops over rows calling torch.sort to
find the gold rank.  Here rank extraction is a vectorized comparison count
(exact stable-sort tie semantics: strictly-smaller distances plus equal
distances at earlier column index), so the whole evaluation is one XLA
computation; CSLS re-ranking (src/utils.py:417-435) and the top-3 retrieval
dump (main.py:395-420) are fused into the same jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_distances(x: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared-L2 distances via norms + matmul, clamped >= 0
    (src/utils.py:202-218)."""
    if y is None:
        y = x
    x_norm = jnp.sum(x ** 2, axis=1)[:, None]
    y_norm = jnp.sum(y ** 2, axis=1)[None, :]
    d = x_norm + y_norm - 2.0 * (x @ y.T)
    return jnp.maximum(d, 0.0)


def csls_sim(sim_mat: jnp.ndarray, k: int) -> jnp.ndarray:
    """CSLS re-ranking: 2*sim - r_left - r_right with mean top-k neighborhood
    similarities (src/utils.py:417-435)."""
    nearest1 = jnp.mean(jax.lax.top_k(sim_mat, k)[0], axis=1)      # rows
    nearest2 = jnp.mean(jax.lax.top_k(sim_mat.T, k)[0], axis=1)    # cols
    out = 2 * sim_mat.T - nearest1[None, :]    # subtract row-wise means
    out = out.T - nearest2[None, :]
    return out


def _ranks(distance: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of column i in a stable ascending sort of row i."""
    n = distance.shape[0]
    d_true = jnp.diagonal(distance)[:, None]
    cols = jnp.arange(distance.shape[1])[None, :]
    rows = jnp.arange(n)[:, None]
    smaller = (distance < d_true).sum(axis=1)
    tied_before = ((distance == d_true) & (cols < rows)).sum(axis=1)
    return smaller + tied_before


@dataclass
class RankResult:
    acc_l2r: np.ndarray     # hits at top_k, fractions
    acc_r2l: np.ndarray
    mr_l2r: float
    mr_r2l: float
    mrr_l2r: float
    mrr_r2l: float
    top3_l2r: Optional[np.ndarray] = None   # (N, 3) retrieved col indices
    ranks_l2r: Optional[np.ndarray] = None  # (N,)


@partial(jax.jit, static_argnames=("csls_k", "use_csls", "distance_kind", "with_top3"))
def _eval_core(emb_l, emb_r, csls_k: int, use_csls: bool,
               distance_kind: int, with_top3: bool):
    if distance_kind == 2:
        distance = pairwise_distances(emb_l, emb_r)
    else:
        # L1 / cityblock (main.py:388-390) — batched abs-diff sum
        distance = jnp.sum(jnp.abs(emb_l[:, None, :] - emb_r[None, :, :]), axis=-1)
    if use_csls:
        distance = 1 - csls_sim(1 - distance, csls_k)

    ranks_l2r = _ranks(distance)
    ranks_r2l = _ranks(distance.T)
    top3 = None
    if with_top3:
        _, top3 = jax.lax.top_k(-distance, 3)
    return distance, ranks_l2r, ranks_r2l, top3


def full_rank_eval(emb_l, emb_r, top_k=(1, 10, 50), csls_k: int = 10,
                   use_csls: bool = False, distance_kind: int = 2,
                   with_top3: bool = False) -> RankResult:
    """Bidirectional Hits@K / MR / MRR (main.py:380-444)."""
    _, ranks_l2r, ranks_r2l, top3 = _eval_core(
        emb_l, emb_r, csls_k, use_csls, distance_kind, with_top3)
    ranks_l2r = np.asarray(ranks_l2r)
    ranks_r2l = np.asarray(ranks_r2l)

    def summarize(ranks):
        acc = np.array([(ranks < k).mean() for k in top_k])
        acc = np.round(acc, 4)
        mr = float((ranks + 1).mean())
        mrr = float((1.0 / (ranks + 1)).mean())
        return acc, mr, mrr

    acc_l, mr_l, mrr_l = summarize(ranks_l2r)
    acc_r, mr_r, mrr_r = summarize(ranks_r2l)
    return RankResult(acc_l2r=acc_l, acc_r2l=acc_r, mr_l2r=mr_l, mr_r2l=mr_r,
                      mrr_l2r=mrr_l, mrr_r2l=mrr_r,
                      top3_l2r=None if top3 is None else np.asarray(top3),
                      ranks_l2r=ranks_l2r)
