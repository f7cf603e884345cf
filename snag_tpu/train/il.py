"""Iterative learning (semi-supervised pseudo-labeling) — device-side.

Reference flow (SNAG_MMEA/model/SNAG.py:192-229 + main.py:214-237): every
``semi_learn_step`` epochs, mutual nearest neighbours among not-yet-aligned
entities become candidate links; a candidate must survive consecutive mining
rounds (except on "fresh" rounds) and every ``semi_learn_step*10`` epochs the
surviving candidates are promoted into the train set.

TPU-native design: the non-train pools are fixed-capacity id arrays with
validity masks; mining is one jitted computation (distance matrix + two
argmins + persistence comparison) and candidate state is a single (Lc,)
int array (right-entity id or -1).  Only the tiny promotion step touches the
host (it must update the numpy train set and log the true-link ratio).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.eval.ranking import pairwise_distances

INF = 1e18


@dataclass
class ILState:
    left_cand: jnp.ndarray    # (Lc,) int32 entity ids
    left_valid: jnp.ndarray   # (Lc,) bool
    right_cand: jnp.ndarray   # (Rc,) int32
    right_valid: jnp.ndarray  # (Rc,) bool
    cand_right: jnp.ndarray   # (Lc,) int32 right id in candidate set, or -1

    @staticmethod
    def init(left_non_train: List[int], right_non_train: List[int]) -> "ILState":
        lc = np.asarray(left_non_train, dtype=np.int32)
        rc = np.asarray(right_non_train, dtype=np.int32)
        return ILState(
            left_cand=jnp.asarray(lc),
            left_valid=jnp.ones(lc.shape, dtype=bool),
            right_cand=jnp.asarray(rc),
            right_valid=jnp.ones(rc.shape, dtype=bool),
            cand_right=-jnp.ones(lc.shape, dtype=jnp.int32),
        )


@jax.jit
def _mine_from_preds(left_cand, left_valid, right_cand, right_valid,
                     cand_right, preds_l, preds_r, fresh):
    lc = left_cand.shape[0]
    mutual = preds_r[preds_l] == jnp.arange(lc)
    pair_right = right_cand[preds_l]
    keep = mutual & left_valid & right_valid[preds_l]
    persist = cand_right == pair_right
    selected = keep & jnp.where(fresh, True, persist)
    return jnp.where(selected, pair_right, -1)


@jax.jit
def _mutual_argmins(emb, left_cand, left_valid, right_cand, right_valid):
    d = pairwise_distances(emb[left_cand], emb[right_cand])
    d_l = jnp.where(right_valid[None, :], d, INF)
    d_r = jnp.where(left_valid[:, None], d, INF)
    return jnp.argmin(d_l, axis=1), jnp.argmin(d_r, axis=0)


def _chunk_scan(emb, lcand, lval, right_emb, right_valid, offset,
                chunk: int, varying_axis=None):
    """Chunked left-scan core: preds_l for the given left slice plus the
    slice's running column minima/argmins (argmins offset to GLOBAL left
    indices via ``offset``; first-occurrence tie-break preserved because
    chunks scan in index order)."""
    lc = lcand.shape[0]
    rc = right_emb.shape[0]
    pad = (-lc) % chunk
    lcand = jnp.pad(lcand, (0, pad))
    lval = jnp.pad(lval, (0, pad))
    n_chunks = (lc + pad) // chunk

    def body(carry, i):
        colmin, colarg = carry
        sl = jax.lax.dynamic_slice(lcand, (i * chunk,), (chunk,))
        vl = jax.lax.dynamic_slice(lval, (i * chunk,), (chunk,))
        d = pairwise_distances(emb[sl], right_emb)          # (chunk, Rc)
        d_l = jnp.where(right_valid[None, :], d, INF)
        pl = jnp.argmin(d_l, axis=1)
        d_r = jnp.where(vl[:, None], d, INF)
        cmin = d_r.min(axis=0)
        carg = jnp.argmin(d_r, axis=0) + i * chunk + offset
        better = cmin < colmin
        colmin = jnp.where(better, cmin, colmin)
        colarg = jnp.where(better, carg, colarg)
        return (colmin, colarg), pl

    init = (jnp.full((rc,), INF), jnp.zeros((rc,), jnp.int32))
    if varying_axis is not None:
        # under shard_map the carry becomes device-varying (it mixes with
        # the sharded left slice); mark the init accordingly
        init = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (varying_axis,), to="varying"), init)
    (colmin, colarg), preds_l = jax.lax.scan(body, init,
                                             jnp.arange(n_chunks))
    return preds_l.reshape(-1)[:lc], colmin, colarg


@partial(jax.jit, static_argnames=("chunk",))
def _mutual_argmins_chunked(emb, left_cand, left_valid, right_cand,
                            right_valid, chunk: int = 4096):
    """Two-direction argmins without materializing the (Lc, Rc) matrix —
    lax.map over left chunks, carrying the running column minima."""
    right_emb = emb[right_cand]
    preds_l, _, preds_r = _chunk_scan(emb, left_cand, left_valid, right_emb,
                                      right_valid, 0, chunk)
    return preds_l, preds_r


def _mutual_argmins_sharded(mesh, emb, left_cand, left_valid, right_cand,
                            right_valid, chunk: int = 4096):
    """Mining sharded over the mesh's data axis: each device scans its
    contiguous left-slice (same chunked core), then ONE all_gather of the
    per-device column minima merges preds_r — first-occurrence tie-break
    preserved because devices hold contiguous ascending slices and argmin
    over the gathered device axis picks the lowest device index."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    lc = left_cand.shape[0]
    pad = (-lc) % n_dev
    lcand = jnp.pad(left_cand, (0, pad))
    lval = jnp.pad(left_valid, (0, pad))
    l_loc = (lc + pad) // n_dev

    def body(emb, lcand, lval, right_cand, right_valid):
        right_emb = emb[right_cand]
        offset = jax.lax.axis_index(axis) * l_loc
        pl, cmin, carg = _chunk_scan(emb, lcand[0], lval[0], right_emb,
                                     right_valid, offset,
                                     min(chunk, l_loc), varying_axis=axis)
        allmin = jax.lax.all_gather(cmin, axis)             # (n_dev, Rc)
        allarg = jax.lax.all_gather(carg, axis)
        dev = jnp.argmin(allmin, axis=0)
        preds_r = jnp.take_along_axis(allarg, dev[None, :], axis=0)
        # identical on every device; emitted per-device (row 0 taken by the
        # caller) because shard_map can't statically infer the replication
        return pl[None], preds_r

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(None, None), P(axis), P(axis), P(None),
                             P(None)),
                   out_specs=(P(axis), P(axis, None)))
    # leading (1, L_loc) axis so the sharded operand keeps a divisible dim
    preds_l, preds_r = jax.jit(fn)(emb, lcand.reshape(n_dev, l_loc),
                                   lval.reshape(n_dev, l_loc),
                                   right_cand, right_valid)
    return preds_l.reshape(-1)[:lc], preds_r[0]


# above this many candidate pairs the full mining matrix would exceed HBM
MINE_FULL_MAX = 25000


def mine_new_links(emb: jnp.ndarray, left_cand, left_valid, right_cand,
                   right_valid, cand_right, fresh, mesh=None) -> jnp.ndarray:
    """One mining round (Iter_new_links, SNAG.py:192-208).

    ``emb`` must already be L2-normalized.  ``fresh`` selects whether the
    persistence filter applies (epoch cadence logic lives in the Runner).
    Returns the new cand_right array.  With ``mesh``, mining shards the
    left-candidate axis over the mesh (one all_gather merges preds_r).
    """
    if mesh is not None and left_cand.shape[0] >= mesh.devices.size:
        preds_l, preds_r = _mutual_argmins_sharded(
            mesh, emb, left_cand, left_valid, right_cand, right_valid)
    elif left_cand.shape[0] > MINE_FULL_MAX:
        preds_l, preds_r = _mutual_argmins_chunked(
            emb, left_cand, left_valid, right_cand, right_valid)
    else:
        preds_l, preds_r = _mutual_argmins(
            emb, left_cand, left_valid, right_cand, right_valid)
    return _mine_from_preds(left_cand, left_valid, right_cand, right_valid,
                            cand_right, preds_l, preds_r, jnp.asarray(fresh))


def promote_candidates(il: ILState, train_ill: np.ndarray,
                       test_ill_set, logger) -> Tuple[ILState, np.ndarray, int]:
    """Host-side data refresh (data_refresh, SNAG.py:210-229): append mined
    pairs to train_ill, invalidate them in the pools, reset candidates."""
    cand = np.asarray(il.cand_right)
    left = np.asarray(il.left_cand)
    lvalid = np.asarray(il.left_valid)
    sel = (cand >= 0) & lvalid
    if not sel.any():
        logger.info("len(new_links) is 0")
        return il, train_ill, 0

    new_pairs = np.stack([left[sel], cand[sel]], axis=1).astype(train_ill.dtype)
    train_ill = np.vstack([train_ill, new_pairs])

    num_true = sum((int(l), int(r)) in test_ill_set for l, r in new_pairs)
    logger.info(f"#new_links_select:{len(new_pairs)}")
    logger.info(f"train_ill.shape:{train_ill.shape}")
    logger.info(f"#true_links: {num_true}")
    logger.info(f"true link ratio: {(100 * num_true / len(new_pairs)):.1f}%")

    new_lvalid = np.asarray(il.left_valid).copy()
    new_lvalid[sel] = False
    rvalid = np.asarray(il.right_valid).copy()
    right = np.asarray(il.right_cand)
    mined_right = set(cand[sel].tolist())
    rvalid &= ~np.isin(right, list(mined_right))

    logger.info(f"#entity not in train set: {int(new_lvalid.sum())} (left) "
                f"{int(rvalid.sum())} (right)")

    new_il = ILState(
        left_cand=il.left_cand,
        left_valid=jnp.asarray(new_lvalid),
        right_cand=il.right_cand,
        right_valid=jnp.asarray(rvalid),
        cand_right=-jnp.ones(il.cand_right.shape, dtype=jnp.int32),
    )
    return new_il, train_ill, len(new_pairs)
