"""Fully-fused bidirectional GAT-layer backward kernel (row-tile).

The GAT backward needs, per edge (i <- j):

    e        = exp(-leakyrelu(s_src[i] + s_dst[j])) * mask
    d_e      = <x[j], G[i]> + r[i]          (G, r = agg / rowsum cotangents)
    d_score  = -d_e * e * leaky'
    d_x[j]  += sum_h e_h * G[i, h]
    d_s_dst[j] += d_score
    d_s_src[i] += d_score

i.e. one reduction over rows and two over columns.  Earlier formulations
paid for moving edge data between the two sort orders (a col-tile kernel
with a padded d_score slot buffer, then a row-tile kernel whose packed
[d_xc | d_score] block needed a 4 ms/layer (E, 384) permutation gather).

This kernel needs NO permutation: the graph is undirected with self-loops
(reference get_adjr semantics, data/graph.py), so the multiset of edges is
symmetric — node j's in-edges are exactly its out-edges reversed.  Both
column reductions therefore become ROW reductions over the reverse edges:
at output tile j, streaming j's out-edges (j -> k) in row-sorted order,

    reverse edge (k -> j):  score = s_src[k] + s_dst[j]
    d_x[j]      += sum_h e_rev_h * G[k, h]
    d_s_dst[j]  += d_score_rev

where s_src[k] / G[k] / r[k] arrive through ONE col-indexed gather of the
[G | r | s_src] node table (node-table source - good DMA locality, unlike
an edge-array permutation) and x[j] / s_dst[j] are tile-resident.  The
forward direction (d_s_src) reuses the forward's xc gather as a VJP
residual.  One launch per layer computes all three gradients; every
output is tile-indexed, written once.

Replaces the edge pipeline of the reference GAT layer's backward
(autograd through SNAG_MMEA/model/layers.py:68-94).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.pallas.tile_segment import (CHUNK, R, TileStructure,
                                              _round_up, flat_scalars,
                                              pallas_available, use_flat)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _leaky(x):
    return jnp.where(x > 0, x, 0.2 * x)


def edgewise_bwd(ge, xgc, maskf, h: int, c: int):
    """(e, d_score, d_xc) from per-edge row/col blocks — shared by the
    kernel (both directions), the spill tails, and the XLA fallback.

    ge:  (K, >=h*c+2h) [G(h*c) | r(h) | s_src(h)] rows of one edge side;
    xgc: (K, >=c+h)    [x | s_dst] rows of the other side;
    maskf: (K, 1) f32 real-edge mask (float — Mosaic cannot minor-dim-
    reshape 1-bit vectors).  The mask folds multiplicatively into e,
    which zeroes d_score and d_xc too.
    """
    s_src = ge[:, h * c + h:h * c + 2 * h].astype(jnp.float32)
    s_dst = xgc[:, c:c + h].astype(jnp.float32)
    score = s_src + s_dst
    e = jnp.exp(-_leaky(score)) * maskf
    x_f = xgc[:, :c].astype(jnp.float32)
    dt = xgc.dtype
    d_e_parts = []
    d_xc = jnp.zeros((ge.shape[0], c), dt)
    for i in range(h):
        gei = ge[:, i * c:(i + 1) * c]
        d_e_parts.append(jnp.sum(x_f * gei.astype(jnp.float32), axis=1,
                                 keepdims=True))
        d_xc = d_xc + e[:, i:i + 1].astype(dt) * gei
    d_e = (jnp.concatenate(d_e_parts, axis=1)
           + ge[:, h * c:h * c + h].astype(jnp.float32))
    dleaky = jnp.where(score > 0, 1.0, 0.2)
    d_score = -d_e * e * dleaky          # e == 0 on padded edges
    return e, d_score, d_xc


def _bwd_body(t, krow_ref, gm_ref, xs_ref, xc_ref, gcol_ref,
              dxd_ref, h: int, c: int, c_pad: int):
    rows = krow_ref[0].reshape(-1)                       # (CHUNK,)
    local = rows - t * R                                 # pad -1 -> <0
    colsR = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
    match = local[:, None] == colsR                      # (CHUNK, R)
    oh = match.astype(gm_ref.dtype)
    maskf = jnp.any(match, axis=1).astype(jnp.float32)[:, None]

    # forward direction: d_s_src[i] over out-edges (i -> k).
    # [G | r | s_src][i] broadcast from the tile (one-hot matmul is an
    # exact row copy for bf16), [x | s_dst][k] streamed (xc residual).
    ge = jax.lax.dot_general(
        oh, gm_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(gm_ref.dtype)
    _, d_score_f, _ = edgewise_bwd(ge, xc_ref[...], maskf, h, c)

    # reverse direction: the same edge stream read as (k -> j) gives
    # d_x[j] / d_s_dst[j].  [G | r | s_src][k] streamed (col-indexed
    # gather), [x | s_dst][j] broadcast from the tile.
    xsb = jax.lax.dot_general(
        oh, xs_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xs_ref.dtype)
    _, d_score_r, d_xr = edgewise_bwd(gcol_ref[...], xsb, maskf, h, c)
    # all three gradients ride ONE reduce dot: d_score_f (the d_s_src
    # cotangent) packs into the spare lanes after [d_xr | d_score_r]
    # (c_pad >= c + 2h by _build_xg), saving a dot and a second output
    # buffer per chunk
    val = jnp.concatenate(
        [d_xr, d_score_r.astype(d_xr.dtype), d_score_f.astype(d_xr.dtype),
         jnp.zeros((CHUNK, c_pad - c - 2 * h), d_xr.dtype)], axis=1)
    dxd_ref[...] += jax.lax.dot_general(
        oh, val, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R, c_pad)


def _bwd_row_kernel(cb_ref, nc_ref, krow_ref, gm_ref, xs_ref, xc_ref,
                    gcol_ref, dxd_ref, *, h: int, c: int,
                    c_pad: int):
    t = pl.program_id(0)
    cix = pl.program_id(1)

    @pl.when(cix == 0)
    def _():
        dxd_ref[...] = jnp.zeros_like(dxd_ref)

    @pl.when(cix < nc_ref[t])
    def _():
        _bwd_body(t, krow_ref, gm_ref, xs_ref, xc_ref, gcol_ref,
                  dxd_ref, h, c, c_pad)


def _bwd_row_kernel_flat(ft_ref, fc_ref, ff_ref, krow_ref, gm_ref, xs_ref,
                         xc_ref, gcol_ref, dxd_ref, *, h: int,
                         c: int, c_pad: int):
    i = pl.program_id(0)
    t = ft_ref[i]

    @pl.when(ff_ref[i] == 1)
    def _():
        dxd_ref[...] = jnp.zeros_like(dxd_ref)

    _bwd_body(t, krow_ref, gm_ref, xs_ref, xc_ref, gcol_ref,
              dxd_ref, h, c, c_pad)


def fused_gat_backward_row(
        gm: jnp.ndarray,       # (n_tiles*R, g_pad) [G | r | s_src] by node
        xs: jnp.ndarray,       # (n_tiles*R, c_pad) [x | s_dst] by node
        xc: jnp.ndarray,       # (E_pad, c_pad) [x | s_dst][col] row-sorted
        gcol: jnp.ndarray,     # (E_pad, g_pad) [G | r | s_src][col]
        krow: jnp.ndarray,     # (E_pad,) row ids, -1 padding
        ts: TileStructure,
        n_heads: int, c_feat: int,
) -> jnp.ndarray:
    """Returns dxd (n_tiles*R, c_pad) f32 [d_x | d_s_dst | d_s_src] tiles
    (ONE packed output — all three gradients ride the same reduce dot);
    rt-spill edges are NOT reduced — the caller's XLA tail adds them."""
    e_pad, c_pad = xc.shape
    n_chunks = e_pad // CHUNK
    krow_mat = krow.astype(jnp.int32).reshape(n_chunks, CHUNK // 128, 128)

    if use_flat(ts):
        return pl.pallas_call(
            functools.partial(_bwd_row_kernel_flat, h=n_heads, c=c_feat,
                              c_pad=c_pad),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ts.n_flat,),
                in_specs=[
                    pl.BlockSpec((1, CHUNK // 128, 128),
                                 lambda i, ft, fc, ff: (fc[i], 0, 0)),
                    pl.BlockSpec((R, gm.shape[1]),
                                 lambda i, ft, fc, ff: (ft[i], 0)),  # gm
                    pl.BlockSpec((R, c_pad),
                                 lambda i, ft, fc, ff: (ft[i], 0)),  # xs
                    pl.BlockSpec((CHUNK, c_pad),
                                 lambda i, ft, fc, ff: (fc[i], 0)),  # xc
                    pl.BlockSpec((CHUNK, gm.shape[1]),
                                 lambda i, ft, fc, ff: (fc[i], 0)),  # gcol
                ],
                out_specs=pl.BlockSpec((R, c_pad),
                                       lambda i, ft, fc, ff: (ft[i], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((ts.n_tiles * R, c_pad),
                                           jnp.float32),
        )(*flat_scalars(ts), krow_mat, gm, xs, xc, gcol)

    def idx_edges(t, c, cb, nc):
        return (jnp.minimum(cb[t] + c, n_chunks - 1), 0)

    return pl.pallas_call(
        functools.partial(_bwd_row_kernel, h=n_heads, c=c_feat, c_pad=c_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts.n_tiles, ts.max_chunks),
            in_specs=[
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((R, gm.shape[1]),
                             lambda t, c, cb, nc: (t, 0)),    # gm tile
                pl.BlockSpec((R, c_pad),
                             lambda t, c, cb, nc: (t, 0)),    # xs tile
                pl.BlockSpec((CHUNK, c_pad), idx_edges),      # xc chunk
                pl.BlockSpec((CHUNK, gm.shape[1]), idx_edges),  # gcol chunk
            ],
            out_specs=pl.BlockSpec((R, c_pad), lambda t, c, *_: (t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ts.n_tiles * R, c_pad), jnp.float32),
    )(jnp.asarray(ts.chunk_base), jnp.asarray(ts.nc), krow_mat, gm, xs, xc,
      gcol)
