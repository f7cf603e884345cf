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

# A/B harnesses force the unfused XLA backward by flipping this.
FUSED_BWD = True


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
    packed block: 4.3 ms/layer, traced.)

    On TPU the whole edgewise pipeline + packed reduce runs as ONE Pallas
    launch (ops/pallas/gat_bwd.py); the d_score row-ordering then costs one
    precomputed (E, 128) gather from the kernel's slot buffer instead of a
    pad + permute pass."""
    x, s_src, s_dst, graph = res
    g_agg, g_rs = cts
    n, c = x.shape
    h = s_src.shape[1]
    dt = x.dtype

    # wide row-gather block in col-sorted order: rows via precomputed
    # row_cs = row[col_order]
    gm = jnp.concatenate([g_agg.astype(dt).reshape(n, h * c),
                          g_rs.astype(dt), s_src.astype(dt)], axis=1)
    g_width = h * c + 2 * h
    g_pad = _round_up(g_width, 128)
    if g_pad != g_width:
        gm = jnp.pad(gm, ((0, 0), (0, g_pad - g_width)))
    # barrier: both d_e and d_xc consume ge — without it XLA duplicates
    # the (E, 604) gather into each consumer (traced: two 1.2 ms copies)
    ge = jax.lax.optimization_barrier(gm[graph.row_cs])    # (E, g_pad)
    xg, c_pad = _build_xg(x, s_dst)
    xgc = jax.lax.optimization_barrier(xg[graph.col_sorted])  # (E, c_pad)
    mask_cs = graph.mask_cs

    from snag_tpu.ops.pallas.gat_bwd import edgewise_bwd, fused_gat_backward

    if (FUSED_BWD and graph.ct_n_tiles and pallas_available()
            and graph.ct_slot_rs is not None):
        krow_cs = jnp.where(mask_cs, graph.row_cs, -1).astype(jnp.int32)
        red_full, ds_slots = fused_gat_backward(
            ge, xgc, krow_cs, graph.col_sorted, _col_ts(graph),
            graph.n_nodes, h, c)
        red = red_full[:graph.n_nodes]
        # d_score in ROW-sorted order straight from the slot buffer
        slot = graph.ct_slot_rs
        dsp_rs = jnp.where((slot >= 0)[:, None],
                           ds_slots[jnp.maximum(slot, 0)], 0).astype(dt)
        if graph.ct_n_spill:
            # edges past a tile's chunk cap: same math via the shared
            # edgewise helper on the few spilled rows, segment-summed in
            sel = graph.ct_spill_sel
            mf_s = mask_cs[sel].astype(jnp.float32)[:, None]
            _, d_score_s, d_xc_s = edgewise_bwd(ge[sel], xgc[sel], mf_s,
                                                h, c)
            packed_s = jnp.concatenate(
                [d_xc_s.astype(jnp.float32), d_score_s,
                 jnp.zeros((sel.shape[0], c_pad - c - h), jnp.float32)],
                axis=1)
            red = red + jax.ops.segment_sum(
                packed_s, graph.ct_spill_row, num_segments=graph.n_nodes,
                indices_are_sorted=True)
            dsp_s = jnp.pad(d_score_s, ((0, 0), (0, 128 - h))).astype(dt)
            dsp_rs = dsp_rs.at[graph.ct_spill_rs_pos].set(dsp_s)
        d_x = red[:, :c].astype(x.dtype)
        d_s_dst = red[:, c:c + h].astype(s_dst.dtype)
        d_s_src = _reduce_rows(dsp_rs, graph.row, graph,
                               use_row=True)[:, :h].astype(s_src.dtype)
        return d_x, d_s_src, d_s_dst, _graph_zeros(graph)

    _, d_score, d_xc = edgewise_bwd(ge, xgc,
                                    mask_cs.astype(jnp.float32)[:, None],
                                    h, c)
    d_score = d_score.astype(jnp.float32)

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
