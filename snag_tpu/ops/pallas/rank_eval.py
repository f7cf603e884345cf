"""Single-pass streaming full-rank evaluation kernels.

The XLA evaluator (eval/ranking.py) materializes the (N, N) distance
matrix and walks it ~8-11 times (CSLS top-k passes, rank extraction,
top-3 dump) — ~4 GB of HBM traffic at DBP15K scale and impossible at
OEA-100K without chunking.  These kernels stream (RT, CT) similarity
tiles through VMEM instead and keep only O(N) state:

* kernel A (`_topk_mean_kernel`): one sweep accumulating each query row's
  running top-k similarities (the CSLS neighbourhood terms,
  reference src/utils.py:417-435) and the matmul-exact diagonal;
* kernel B (`_rank_kernel`): a second sweep that recomputes each tile,
  applies the CSLS adjustment, and accumulates the gold-rank comparison
  counts (stable-sort tie semantics of SNAG_MMEA/main.py:400-411) plus a
  running top-3 retrieval list (main.py:395-420).

Each direction costs exactly two tile matmuls; everything else stays in
registers/VMEM.  Total HBM traffic is O(N * d) per sweep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.pallas.tile_segment import pallas_available, _round_up

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _IMPORTED = True
except Exception:  # pragma: no cover
    _IMPORTED = False

FORCE_INTERPRET = False   # tests: run interpreted on CPU
DISABLE = False           # A/B harnesses: force the XLA fallback

_NEG = -1e30
_RT = 512


def rank_eval_ok() -> bool:
    if DISABLE:
        return False
    if FORCE_INTERPRET and _IMPORTED:
        return True
    return _IMPORTED and pallas_available()


def _pick_rt(n: int) -> int:
    best, best_pad = 512, _round_up(n, 512)
    for rt in (384, 256, 128):
        if _round_up(n, rt) < best_pad:
            best, best_pad = rt, _round_up(n, rt)
    return best


def _pad2(x, npad):
    n, d = x.shape
    if n == npad:
        return x
    return jnp.concatenate([x, jnp.zeros((npad - n, d), x.dtype)], axis=0)


def _dist_tile(x_ref, y_ref, xn_ref, yn_ref):
    """max(d, 0) squared-L2 for one (RT, CT) tile (src/utils.py:202-218)."""
    xy = jax.lax.dot_general(
        x_ref[...], y_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d = xn_ref[:, 0][:, None] + yn_ref[0][None, :] - 2.0 * xy
    return jnp.maximum(d, 0.0)


def _merge_topk(accv, tilev, k):
    """k rounds of max-extraction over [running | tile] (values only)."""
    buf = jnp.concatenate([accv, tilev], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)
    outs = []
    for _ in range(k):
        v = jnp.max(buf, axis=1, keepdims=True)
        outs.append(v)
        # mask ONE occurrence: the first position attaining the max
        # (min-index among hits; Mosaic has no cumsum)
        hit = buf >= v
        first = jnp.min(jnp.where(hit, pos, jnp.int32(2 ** 30)), axis=1,
                        keepdims=True)
        buf = jnp.where(hit & (pos == first), _NEG, buf)
    return jnp.concatenate(outs, axis=1)


def _topk_mean_kernel(x_ref, y_ref, xn_ref, yn_ref, mean_ref, diag_ref,
                      acc_ref, *, rt: int, k: int, n: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.full_like(acc_ref, _NEG)
        diag_ref[...] = jnp.zeros_like(diag_ref)

    s = 1.0 - _dist_tile(x_ref, y_ref, xn_ref, yn_ref)
    cols = j * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    s = jnp.where(cols < n, s, _NEG)

    acc_ref[:, :k] = _merge_topk(acc_ref[:, :k], s, k)

    @pl.when(j == i)
    def _():
        rows = i * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
        diag_ref[:, 0] = jnp.sum(
            jnp.where(rows == cols, s, 0.0), axis=1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        mean_ref[:, 0] = jnp.mean(acc_ref[:, :k], axis=1)


def _rank_kernel(x_ref, y_ref, xn_ref, yn_ref, rl_ref, rr_ref, dtrue_ref,
                 out_ref, cnt_ref, topv_ref, topi_ref, *,
                 rt: int, n: int, use_csls: bool, with_top3: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)
        topv_ref[...] = jnp.full_like(topv_ref, _NEG)
        topi_ref[...] = jnp.zeros_like(topi_ref)

    dmax = _dist_tile(x_ref, y_ref, xn_ref, yn_ref)
    if use_csls:
        # EXACT op order of eval/ranking.csls_sim: (2*sim - r_row) - r_col
        s = 1.0 - dmax
        dist = 1.0 - ((2.0 * s - rl_ref[:, 0][:, None]) - rr_ref[0][None, :])
    else:
        dist = dmax

    rows = i * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = j * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    valid = cols < n
    dt = dtrue_ref[:, 0][:, None]
    smaller = valid & (cols != rows) & (dist < dt)
    tied = valid & (cols < rows) & (dist == dt)
    cnt_ref[:, 0] += jnp.sum(smaller.astype(jnp.int32), axis=1)
    cnt_ref[:, 1] += jnp.sum(tied.astype(jnp.int32), axis=1)

    if with_top3:
        cand = jnp.where(valid, -dist, _NEG)
        bufv = jnp.concatenate([topv_ref[:, :3], cand], axis=1)
        bufi = jnp.concatenate([topi_ref[:, :3], cols], axis=1)
        nv, ni = [], []
        for _ in range(3):
            v = jnp.max(bufv, axis=1, keepdims=True)
            hit = bufv >= v
            # among ties pick the lowest column id (== first occurrence
            # in [running | ascending-j tiles] order)
            iid = jnp.min(jnp.where(hit, bufi, jnp.int32(2 ** 30)),
                          axis=1, keepdims=True)
            nv.append(v)
            ni.append(iid)
            bufv = jnp.where(hit & (bufi == iid), _NEG, bufv)
        topv_ref[:, :3] = jnp.concatenate(nv, axis=1)
        topi_ref[:, :3] = jnp.concatenate(ni, axis=1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:, 0:2] = cnt_ref[:, 0:2]
        if with_top3:
            out_ref[:, 2:5] = topi_ref[:, :3]


def _run_topk_mean(x, y, xn, yn, k, n, npad, rt):
    n_t = npad // rt
    mean, diag = pl.pallas_call(
        functools.partial(_topk_mean_kernel, rt=rt, k=k, n=n),
        grid=(n_t, n_t),
        in_specs=[
            pl.BlockSpec((rt, x.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, x.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, rt), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rt, 128), jnp.float32)],
        interpret=FORCE_INTERPRET,
    )(x, y, xn, yn)
    return mean[:, 0], diag[:, 0]


def _run_ranks(x, y, xn, yn, rl, rr, dtrue, n, npad, rt, use_csls,
               with_top3):
    n_t = npad // rt
    out = pl.pallas_call(
        functools.partial(_rank_kernel, rt=rt, n=n, use_csls=use_csls,
                          with_top3=with_top3),
        grid=(n_t, n_t),
        in_specs=[
            pl.BlockSpec((rt, x.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, x.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, rt), lambda i, j: (0, j)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, rt), lambda i, j: (0, j)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rt, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rt, 128), jnp.int32),
            pltpu.VMEM((rt, 128), jnp.float32),
            pltpu.VMEM((rt, 128), jnp.int32),
        ],
        interpret=FORCE_INTERPRET,
    )(x, y, xn, yn, rl, rr, dtrue)
    ranks = out[:n, 0] + out[:n, 1]
    top3 = out[:n, 2:5] if with_top3 else None
    return ranks, top3


@functools.partial(jax.jit, static_argnames=("csls_k", "use_csls",
                                             "with_top3"))
def streaming_rank_eval(emb_l: jnp.ndarray, emb_r: jnp.ndarray,
                        csls_k: int, use_csls: bool, with_top3: bool
                        ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                   Optional[jnp.ndarray]]:
    """Bidirectional gold ranks (+ l2r top-3) without materializing (N, N).

    Matches eval/ranking._eval_core's protocol: squared-L2 distances,
    optional CSLS re-ranking with k neighbourhood means, stable-sort tie
    counting with the gold column excluded from the strict comparison.
    """
    n, d = emb_l.shape
    rt = _pick_rt(n)
    npad = _round_up(n, rt)
    x = _pad2(emb_l.astype(jnp.float32), npad)
    y = _pad2(emb_r.astype(jnp.float32), npad)
    xn = jnp.sum(x * x, axis=1, keepdims=True)                 # (Np, 1)
    yn_row = jnp.sum(y * y, axis=1, keepdims=True)
    yn = yn_row.reshape(1, npad)
    xn_col = xn.reshape(1, npad)

    if use_csls:
        rl, diag_lr = _run_topk_mean(x, y, xn, yn, csls_k, n, npad, rt)
        rr, diag_rl = _run_topk_mean(y, x, yn_row, xn_col, csls_k, n,
                                     npad, rt)
        rl_col = rl.reshape(npad, 1)
        rr_col = rr.reshape(npad, 1)
        rl_row = rl.reshape(1, npad)
        rr_row = rr.reshape(1, npad)
        # EXACT in-kernel op order: 1 - ((2s - r_row) - r_col)
        dtrue_l2r = (1.0 - ((2.0 * diag_lr - rl) - rr)).reshape(npad, 1)
        dtrue_r2l = (1.0 - ((2.0 * diag_rl - rr) - rl)).reshape(npad, 1)
        ranks_l2r, top3 = _run_ranks(x, y, xn, yn, rl_col, rr_row,
                                     dtrue_l2r, n, npad, rt, True,
                                     with_top3)
        ranks_r2l, _ = _run_ranks(y, x, yn_row, xn_col, rr_col, rl_row,
                                  dtrue_r2l, n, npad, rt, True, False)
    else:
        zeros_r = jnp.zeros((npad, 1), jnp.float32)
        zeros_c = jnp.zeros((1, npad), jnp.float32)
        # raw-distance diag, elementwise (same value modulo matmul tiling;
        # the gold column is excluded from the strict comparison anyway)
        dmax = jnp.maximum(xn[:, 0] + yn_row[:, 0]
                           - 2.0 * jnp.sum(x * y, axis=1), 0.0)
        dtrue = dmax.reshape(npad, 1)
        ranks_l2r, top3 = _run_ranks(x, y, xn, yn, zeros_r, zeros_c,
                                     dtrue, n, npad, rt, False, with_top3)
        ranks_r2l, _ = _run_ranks(y, x, yn_row, xn_col, zeros_r, zeros_c,
                                  dtrue, n, npad, rt, False, False)
    return ranks_l2r, ranks_r2l, top3
