"""SPMD full-rank evaluation over a device mesh.

Shards the QUERY rows of the bidirectional ranking (main.py:380-444
protocol) across the mesh's data axis; the candidate matrix is replicated.
All rank math is local to a device given the candidate-side CSLS
neighborhood means, which are the single cross-device quantity: each
device computes the top-k similarities of every candidate against its
local query block, one small ``all_gather`` ((N, k) per device) merges
them, and the global top-k-of-top-ks mean is exact because the global
top-k of a row is contained in the union of per-block top-ks.

Same comparison-count rank semantics as eval/ranking.py (strictly-smaller
plus earlier-index ties), so sharded and single-device results agree up to
matmul-tiling fp rounding.

Memory envelope: the per-device transient is the (N/n_dev, N) similarity
block — 0.6 GB f32 per device at the 35K-pair OEA-100K test split on 8
devices, well inside HBM; the reference protocol's largest split stays
under that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from snag_tpu.eval.ranking import pairwise_distances, topk_rowwise


def _local_ranks(q_blk, emb_c, gold_blk, valid_blk, csls_k: int,
                 use_csls: bool, axis: str):
    """Ranks + top3 for this device's query block (inside shard_map)."""
    sim = 1.0 - pairwise_distances(q_blk, emb_c)          # (B, Nc)
    if use_csls:
        r_q = jnp.mean(topk_rowwise(sim, csls_k)[0], axis=1)        # (B,)
        # padded query rows must not contribute to the candidate-side
        # neighborhood means (the single-device path sees exactly n rows)
        sim_v = jnp.where(valid_blk[:, None], sim, -jnp.inf)
        loc_top = topk_rowwise(sim_v.T, csls_k)[0]                  # (Nc, k)
        # union of per-device top-ks contains the global top-k
        all_top = jax.lax.all_gather(loc_top, axis, axis=1, tiled=True)
        r_c = jnp.mean(topk_rowwise(all_top, csls_k)[0], axis=1)    # (Nc,)
        d = 1.0 - (2.0 * sim - r_q[:, None] - r_c[None, :])
    else:
        d = 1.0 - sim
    rows = jnp.arange(q_blk.shape[0])
    d_true = d[rows, gold_blk]
    cols = jnp.arange(emb_c.shape[0])[None, :]
    not_gold = cols != gold_blk[:, None]
    smaller = ((d < d_true[:, None]) & not_gold).sum(axis=1)
    tied_before = ((d == d_true[:, None]) & (cols < gold_blk[:, None])).sum(axis=1)
    top3 = topk_rowwise(-d, 3)[1]
    return smaller + tied_before, top3


def _one_direction(mesh, emb_q, emb_c, csls_k: int, use_csls: bool):
    from jax import shard_map

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = emb_q.shape[0]
    pad = (-n) % n_dev
    gold = jnp.arange(n + pad, dtype=jnp.int32)
    valid = jnp.arange(n + pad) < n
    if pad:
        emb_q = jnp.concatenate(
            [emb_q, jnp.zeros((pad, emb_q.shape[1]), emb_q.dtype)])
        # padded golds point at candidate 0; their ranks are sliced off
        gold = gold.at[n:].set(0)

    fn = shard_map(
        partial(_local_ranks, csls_k=csls_k, use_csls=use_csls, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(axis), P(axis)),
        out_specs=(P(axis), P(axis, None)),
    )
    ranks, top3 = jax.jit(fn)(emb_q, emb_c, gold, valid)
    return ranks[:n], top3[:n]


def sharded_full_rank_eval(mesh, emb_l, emb_r, csls_k: int = 10,
                           use_csls: bool = False):
    """Bidirectional ranks + l2r top-3, queries sharded over ``mesh``.

    Returns (ranks_l2r, ranks_r2l, top3_l2r) as numpy arrays — the same
    contract the streaming kernel path feeds into
    eval/ranking.full_rank_eval's summarize step.
    """
    emb_l = jnp.asarray(emb_l)
    emb_r = jnp.asarray(emb_r)
    ranks_l2r, top3 = _one_direction(mesh, emb_l, emb_r, csls_k, use_csls)
    ranks_r2l, _ = _one_direction(mesh, emb_r, emb_l, csls_k, use_csls)
    return (np.asarray(ranks_l2r), np.asarray(ranks_r2l), np.asarray(top3))
