"""Fully-fused sparse-GAT attention + aggregation (diag mode).

One Pallas launch per layer computes, for every head h and node i:

    score_ij = s_src[i, h] + s_dst[j, h]
    e_ij     = exp(-leakyrelu_0.2(score_ij))        (masked edges -> 0)
    agg[i,h] = sum_j e_ij * x[j]
    rowsum[i,h] = sum_j e_ij

This replaces the reference GAT layer's edge pipeline
(SNAG_MMEA/model/layers.py:68-94: edge cat + matmul + exp + two spmms per
head) and supersedes the plain weighted reduce of tile_segment.py for the
forward: narrow (E, H) score gathers are latency-bound on TPU (~4-6 ms
each, profiled), so here

* ``s_dst`` rides the spare lanes of the padded feature block — ONE wide
  col-gather moves features and destination scores together;
* ``s_src`` needs no gather at all: the kernel receives each output
  tile's (R, H) block directly and broadcasts it onto edges with the
  same one-hot matmul that does the reduction;
* masked/padded edges carry row = -1 in ``krow`` and match no output row.

The backward (ops/pallas/gat_bwd.py) mirrors this row-tile structure:
it reuses this forward's xc gather as a residual, tile-loads the
cotangent block, and accumulates d_s_src in-kernel — no narrow edge ops
anywhere in the layer.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.pallas.tile_segment import (CHUNK, E_LANES, R,
                                              TileStructure, _round_up,
                                              flat_scalars, pallas_available,
                                              use_flat)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _leaky(x):
    return jnp.where(x > 0, x, 0.2 * x)


def _attn_body(t, row_ref, xg_ref, ssrc_ref, out_ref,
               n_heads: int, c_pad: int, c_feat: int):
    rows = row_ref[0].reshape(-1)                         # (CHUNK,)
    local = rows - t * R                                  # -1 pad -> <0
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
    match = local[:, None] == cols                        # (CHUNK, R)
    oh = match.astype(xg_ref.dtype)

    xg = xg_ref[...]                                      # (CHUNK, c_pad)
    # s_src broadcast to edges: one-hot matmul against the tile block
    ssrc_e = jax.lax.dot_general(
        oh, ssrc_ref[...].astype(xg.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (CHUNK, 128)
    s_dst = xg[:, c_feat:c_feat + n_heads].astype(jnp.float32)
    score = ssrc_e[:, :n_heads] + s_dst                   # (CHUNK, H)
    e = jnp.exp(-_leaky(score))
    # padded/out-of-tile edges matched no row -> zero via row mask
    in_tile = jnp.any(match, axis=1)
    e = jnp.where(in_tile[:, None], e, 0.0).astype(xg.dtype)

    # xg column c_feat+n_heads is all-ones (gat_attn_primitive._build_xg),
    # so each head's aggregation dot yields rowsum_h in that column for
    # free — no separate rowsum dot, no second output buffer
    for h in range(n_heads):
        ohw = oh * e[:, h][:, None]
        part = jax.lax.dot_general(
            ohw, xg, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (R, c_pad)
        out_ref[:, h * c_pad:(h + 1) * c_pad] += part


def _attn_kernel(cb_ref, nc_ref, row_ref, xg_ref, ssrc_ref, out_ref,
                 *, n_heads: int, c_pad: int, c_feat: int):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(c < nc_ref[t])
    def _():
        _attn_body(t, row_ref, xg_ref, ssrc_ref, out_ref,
                   n_heads, c_pad, c_feat)


def _attn_kernel_flat(ft_ref, fc_ref, ff_ref, row_ref, xg_ref, ssrc_ref,
                      out_ref, *, n_heads: int, c_pad: int,
                      c_feat: int):
    i = pl.program_id(0)
    t = ft_ref[i]

    @pl.when(ff_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    _attn_body(t, row_ref, xg_ref, ssrc_ref, out_ref,
               n_heads, c_pad, c_feat)


def fused_gat_attention(
        xc: jnp.ndarray,          # (E_pad, c_pad): [x | s_dst | 1 | 0][col]
        s_src: jnp.ndarray,       # (N, H)
        krow: jnp.ndarray,        # (E_pad,) int32 row ids, -1 on padding
        ts: TileStructure,
        n_nodes: int, n_heads: int, c_feat: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (agg (N, H, c_feat) f32, rowsum (N, H) f32).  ``xc`` is the
    col-gathered feature block in row-sorted edge order — materialized by
    the caller once and shared with the backward as a VJP residual.  Its
    column ``c_feat + n_heads`` must be all-ones (_build_xg): the
    aggregation dot then carries rowsum in that column of each head's
    output block, so the kernel has ONE dot and ONE output per chunk."""
    e_pad, c_pad = xc.shape
    assert c_pad % 128 == 0 and e_pad % CHUNK == 0
    row_mat = krow.astype(jnp.int32).reshape(e_pad // CHUNK, CHUNK // 128, 128)
    n_chunks = e_pad // CHUNK
    n_pad = ts.n_tiles * R
    ssrc_wide = jnp.zeros((n_pad, E_LANES), xc.dtype)
    ssrc_wide = ssrc_wide.at[:n_nodes, :n_heads].set(s_src.astype(xc.dtype))
    rs_col = c_feat + n_heads

    if use_flat(ts):
        out = pl.pallas_call(
            functools.partial(_attn_kernel_flat, n_heads=n_heads,
                              c_pad=c_pad, c_feat=c_feat),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ts.n_flat,),
                in_specs=[
                    pl.BlockSpec((1, CHUNK // 128, 128),
                                 lambda i, ft, fc, ff: (fc[i], 0, 0)),
                    pl.BlockSpec((CHUNK, c_pad),
                                 lambda i, ft, fc, ff: (fc[i], 0)),    # xc
                    pl.BlockSpec((R, E_LANES),
                                 lambda i, ft, fc, ff: (ft[i], 0)),    # s_src
                ],
                out_specs=pl.BlockSpec((R, n_heads * c_pad),
                                       lambda i, ft, fc, ff: (ft[i], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, n_heads * c_pad),
                                           jnp.float32),
        )(*flat_scalars(ts), row_mat, xc, ssrc_wide)
        # flat mode covers every chunk — no spill tail
        ob = out[:n_nodes].reshape(n_nodes, n_heads, c_pad)
        return ob[:, :, :c_feat], ob[:, :, rs_col]

    def idx_edges(t, c, cb, nc):
        return (jnp.minimum(cb[t] + c, n_chunks - 1), 0)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_heads=n_heads, c_pad=c_pad,
                          c_feat=c_feat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts.n_tiles, ts.max_chunks),
            in_specs=[
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((CHUNK, c_pad), idx_edges),       # xc
                pl.BlockSpec((R, E_LANES),
                             lambda t, c, cb, nc: (t, 0)),     # s_src tile
            ],
            out_specs=pl.BlockSpec((R, n_heads * c_pad),
                                   lambda t, c, *_: (t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_heads * c_pad), jnp.float32),
    )(jnp.asarray(ts.chunk_base), jnp.asarray(ts.nc), row_mat, xc, ssrc_wide)

    ob = out[:n_nodes].reshape(n_nodes, n_heads, c_pad)
    agg = ob[:, :, :c_feat]
    rowsum = ob[:, :, rs_col]

    if ts.n_spill:
        sel = jnp.asarray(ts.spill_sel)
        srow = jnp.asarray(ts.spill_row)
        xs = xc[sel].astype(jnp.float32)                      # (S, c_pad)
        srcs = ssrc_wide[jnp.maximum(jnp.asarray(krow)[sel], 0), :n_heads]
        score = srcs.astype(jnp.float32) + xs[:, c_feat:c_feat + n_heads]
        es = jnp.where((jnp.asarray(krow)[sel] >= 0)[:, None],
                       jnp.exp(-_leaky(score)), 0.0)          # (S, H)
        tail = jax.ops.segment_sum(
            (es[:, :, None] * xs[:, None, :c_feat]).reshape(sel.shape[0], -1),
            srow, num_segments=n_nodes, indices_are_sorted=True)
        agg = agg + tail.reshape(n_nodes, n_heads, c_feat)
        rowsum = rowsum + jax.ops.segment_sum(
            es, srow, num_segments=n_nodes, indices_are_sorted=True)
    return agg, rowsum


def xla_gat_attention(xc, s_src, krow, n_nodes, n_heads, c_feat):
    """Fallback (CPU tests / non-TPU): same math, plain segment ops over
    the caller's pre-gathered ``xc`` block."""
    mask = krow >= 0
    row = jnp.maximum(krow, 0)
    score = s_src[row].astype(jnp.float32) + \
        xc[:, c_feat:c_feat + n_heads].astype(jnp.float32)
    e = jnp.where(mask[:, None], jnp.exp(-_leaky(score)), 0.0)
    xf = xc[:, :c_feat].astype(jnp.float32)
    vals = (e[:, :, None] * xf[:, None, :]).reshape(krow.shape[0], -1)
    agg = jax.ops.segment_sum(vals, row, num_segments=n_nodes,
                              indices_are_sorted=True)
    rowsum = jax.ops.segment_sum(e, row, num_segments=n_nodes,
                                 indices_are_sorted=True)
    return agg.reshape(n_nodes, n_heads, c_feat), rowsum
