"""Whole-layer fused GAT attention primitive with scatter-free custom VJP.

``gat_attention(x, s_src, s_dst, graph)`` computes the complete sparse
attention + aggregation of a diag-mode GAT layer (reference
SNAG_MMEA/model/layers.py:68-94) in one Pallas launch (see
ops/pallas/gat_attention.py).  The custom backward touches edges ONLY
through wide gathers and two tile-kernel reductions:

    ge  = [g_agg | g_rs | s_src][row]        one wide row-gather
    xgc = [x | s_dst][col]                   one wide col-gather
    e, d_e, d_score                          edgewise from ge/xgc slices
    d_x, d_s_dst                             ONE col-tile reduce (packed)
    d_s_src                                  ONE row-tile reduce

Narrow (E, H) gathers/reduces — latency-bound on TPU, ~4-6 ms each — do
not appear anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.pallas.tile_segment import (TileStructure, _round_up,
                                              pallas_available,
                                              tile_weighted_segment_sum,
                                              xla_weighted_segment_sum)
from snag_tpu.ops.pallas.gat_attention import (fused_gat_attention,
                                               xla_gat_attention, _leaky)


def _row_ts(graph) -> TileStructure:
    return TileStructure(
        chunk_base=graph.rt_chunk_base, nc=graph.rt_nc,
        spill_sel=graph.rt_spill_sel, spill_row=graph.rt_spill_row,
        n_tiles=graph.rt_n_tiles, max_chunks=graph.rt_max_chunks,
        n_spill=graph.rt_n_spill)


def _col_ts(graph) -> TileStructure:
    return TileStructure(
        chunk_base=graph.ct_chunk_base, nc=graph.ct_nc,
        spill_sel=graph.ct_spill_sel, spill_row=graph.ct_spill_row,
        n_tiles=graph.ct_n_tiles, max_chunks=graph.ct_max_chunks,
        n_spill=graph.ct_n_spill)


def _reduce_rows(vals, keys, graph, use_row: bool):
    """Unweighted (N, C) reduce of edge values over row- or col-sorted keys."""
    ones = jnp.ones((vals.shape[0], 1), vals.dtype)
    ts = _row_ts(graph) if use_row else _col_ts(graph)
    if ts.n_tiles and pallas_available():
        agg, _ = tile_weighted_segment_sum(vals, ones, keys, ts,
                                           graph.n_nodes)
    else:
        agg, _ = xla_weighted_segment_sum(vals, ones, keys, graph.n_nodes)
    return agg[:, 0, :]


def _build_xg(x, s_dst):
    n, c = x.shape
    h = s_dst.shape[1]
    c_pad = _round_up(c + h, 128)
    # ONE concatenate fusion — zeros + .at[].set() lowers to repeated
    # dynamic-update-slice passes over the full array (profiled ~4 ms each
    # at (E, 384) scale in the backward)
    xg = jnp.concatenate(
        [x, s_dst.astype(x.dtype),
         jnp.zeros((n, c_pad - c - h), x.dtype)], axis=1)
    return xg, c_pad


@jax.custom_vjp
def gat_attention(x: jnp.ndarray, s_src: jnp.ndarray, s_dst: jnp.ndarray,
                  graph) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (N, C); s_src/s_dst: (N, H) attention score halves.
    Returns (agg (N, H, C) f32, rowsum (N, H) f32)."""
    return _fwd(x, s_src, s_dst, graph)[0]


def _fwd(x, s_src, s_dst, graph):
    n, c = x.shape
    h = s_src.shape[1]
    xg, c_pad = _build_xg(x, s_dst)
    krow = jnp.where(graph.mask, graph.row, -1).astype(jnp.int32)
    if graph.rt_n_tiles and pallas_available():
        out = fused_gat_attention(xg, s_src, krow, graph.col, _row_ts(graph),
                                  n, h, c)
    else:
        out = xla_gat_attention(xg, s_src, krow, graph.col, n, h, c)
    return out, (x, s_src, s_dst, graph)


def _graph_zeros(graph):
    def z(a):
        if a is None:
            return None
        if jnp.issubdtype(jnp.result_type(a), jnp.floating):
            return jnp.zeros(a.shape, jnp.result_type(a))
        return np.zeros(a.shape, dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(z, graph)


def _bwd(res, cts):
    """Entirely in COL-SORTED edge order: the packed [d_xc | d_score]
    reduction (the wide one) then needs NO edge permutation — only the
    narrow d_score is permuted back to row order for the d_s_src reduce.
    (The previous row-ordered formulation permuted the full (E, 384)
    packed block: 4.3 ms/layer, traced.)"""
    x, s_src, s_dst, graph = res
    g_agg, g_rs = cts
    n, c = x.shape
    h = s_src.shape[1]
    dt = x.dtype

    # wide row-gather block in col-sorted order: rows via precomputed
    # row_cs = row[col_order]
    gm = jnp.concatenate([g_agg.astype(dt).reshape(n, h * c),
                          g_rs.astype(dt), s_src.astype(dt)], axis=1)
    # barrier: both d_e and d_xc consume ge — without it XLA duplicates
    # the (E, 604) gather into each consumer (traced: two 1.2 ms copies)
    ge = jax.lax.optimization_barrier(gm[graph.row_cs])    # (E, HC+2H)
    xg, c_pad = _build_xg(x, s_dst)
    xgc = jax.lax.optimization_barrier(xg[graph.col_sorted])  # (E, c_pad)

    score = (ge[:, h * c + h:h * c + 2 * h].astype(jnp.float32)
             + xgc[:, c:c + h].astype(jnp.float32))        # (E, H)
    mask_cs = graph.mask_cs
    e = jnp.where(mask_cs[:, None], jnp.exp(-_leaky(score)), 0.0)

    xc_feat = xgc[:, :c]
    d_e_parts = []
    d_xc = jnp.zeros((ge.shape[0], c), dt)
    for i in range(h):
        gei = ge[:, i * c:(i + 1) * c]
        d_e_parts.append(jnp.sum(xc_feat.astype(jnp.float32)
                                 * gei.astype(jnp.float32), axis=1))
        d_xc = d_xc + e[:, i:i + 1].astype(dt) * gei
    g_rs_e = ge[:, h * c:h * c + h].astype(jnp.float32)
    d_e = jnp.stack(d_e_parts, axis=1) + g_rs_e            # (E, H)
    dleaky = jnp.where(score > 0, 1.0, 0.2)
    d_score = jnp.where(mask_cs[:, None], -d_e * e * dleaky, 0.0)

    # ONE packed col reduce, already col-sorted: [d_xc | d_score]
    packed = jnp.concatenate(
        [d_xc, d_score.astype(dt),
         jnp.zeros((ge.shape[0], c_pad - c - h), dt)], axis=1)
    red = _reduce_rows(packed, graph.col_sorted, graph, use_row=False)
    d_x = red[:, :c].astype(x.dtype)
    d_s_dst = red[:, c:c + h].astype(s_dst.dtype)

    # narrow d_score back to row order for the d_s_src row reduce
    dsp = jnp.pad(d_score.astype(dt), ((0, 0), (0, 128 - h)))
    dsp_rs = dsp[graph.inv_col_order]
    d_s_src = _reduce_rows(dsp_rs, graph.row, graph,
                           use_row=True)[:, :h].astype(s_src.dtype)

    return d_x, d_s_src, d_s_dst, _graph_zeros(graph)


gat_attention.defvjp(_fwd, _bwd)
