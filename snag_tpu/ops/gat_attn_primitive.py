"""Whole-layer fused GAT attention primitive with scatter-free custom VJP.

``gat_attention(x, s_src, s_dst, graph)`` computes the complete sparse
attention + aggregation of a diag-mode GAT layer (reference
SNAG_MMEA/model/layers.py:68-94) in one Pallas launch (see
ops/pallas/gat_attention.py).  The custom backward is ONE bidirectional
row-tile launch (ops/pallas/gat_bwd.py): undirected-graph symmetry turns
the column reductions (d_x, d_s_dst) into row reductions over the reverse
edges, so all three gradients accumulate into tile-indexed outputs with
no permutation between edge sort orders.  The forward's row-sorted
xc = [x | s_dst][col] gather is reused as a residual; the only other
edge-order data movement is the col-indexed [G | r | s_src] gather.

Narrow (E, H) gathers/reduces — latency-bound on TPU, ~3-6 ms each — do
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
                                              use_flat,
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
        n_spill=graph.rt_n_spill, flat_tile=graph.rt_flat_tile,
        flat_chunk=graph.rt_flat_chunk, flat_first=graph.rt_flat_first,
        n_flat=graph.rt_n_flat)


def _col_ts(graph) -> TileStructure:
    return TileStructure(
        chunk_base=graph.ct_chunk_base, nc=graph.ct_nc,
        spill_sel=graph.ct_spill_sel, spill_row=graph.ct_spill_row,
        n_tiles=graph.ct_n_tiles, max_chunks=graph.ct_max_chunks,
        n_spill=graph.ct_n_spill, flat_tile=graph.ct_flat_tile,
        flat_chunk=graph.ct_flat_chunk, flat_first=graph.ct_flat_first,
        n_flat=graph.ct_n_flat)


def _reduce_edges(vals, keys, graph, use_row: bool):
    """Unweighted (N, C) reduce of edge values over sorted row/col keys."""
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
    # layout: [x (c) | s_dst (h) | ones (1) | zeros]; the ones column lets
    # the forward kernel's e-weighted aggregation dot produce rowsum_h as
    # out[:, h*c_pad + c + h] for free — no separate rowsum dot, no second
    # output buffer (the per-grid-step fixed cost is the GAT bottleneck,
    # VERDICT r4 weak #1).  Width covers c + 2h so the backward kernel can
    # pack [d_x | d_s_dst | d_s_src] into one output at the same c_pad.
    c_pad = _round_up(max(c + h + 1, c + 2 * h), 128)
    # ONE concatenate fusion — zeros + .at[].set() lowers to repeated
    # dynamic-update-slice passes over the full array (profiled ~4 ms each
    # at (E, 384) scale in the backward)
    xg = jnp.concatenate(
        [x, s_dst.astype(x.dtype), jnp.ones((n, 1), x.dtype),
         jnp.zeros((n, c_pad - c - h - 1), x.dtype)], axis=1)
    return xg, c_pad


def _build_gm(g_agg, g_rs, s_src, graph, dt):
    """(n_pad, g_pad) [G | r | s_src] node block for the backward kernel;
    built in ONE concatenate (a separate pad op gets commuted past gathers
    by XLA into a full extra (E, g_pad) pass, traced)."""
    n = s_src.shape[0]
    h = s_src.shape[1]
    c = g_agg.shape[2]
    g_width = h * c + 2 * h
    g_pad = _round_up(g_width, 128)
    gm = jnp.concatenate(
        [g_agg.astype(dt).reshape(n, h * c), g_rs.astype(dt),
         s_src.astype(dt), jnp.zeros((n, g_pad - g_width), dt)], axis=1)
    return gm


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
    # the ONE wide edge gather of the layer, shared fwd/bwd as a residual
    xc = xg[graph.col]                                        # (E, c_pad)
    krow = jnp.where(graph.mask, graph.row, -1).astype(jnp.int32)
    if graph.rt_n_tiles and pallas_available():
        out = fused_gat_attention(xc, s_src, krow, _row_ts(graph), n, h, c)
    else:
        out = xla_gat_attention(xc, s_src, krow, n, h, c)
    return out, (x, xc, s_src, s_dst, graph)


def _graph_zeros(graph):
    def z(a):
        if a is None:
            return None
        if jnp.issubdtype(jnp.result_type(a), jnp.floating):
            return jnp.zeros(a.shape, jnp.result_type(a))
        return np.zeros(a.shape, dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(z, graph)


def _bwd(res, cts):
    """Row-tile fused backward; see module docstring.  The XLA fallback
    (CPU tests / non-TPU) runs the same edgewise math over col-sorted
    blocks reordered from the shared xc residual."""
    x, xc, s_src, s_dst, graph = res
    g_agg, g_rs = cts
    n, c = x.shape
    h = s_src.shape[1]
    dt = x.dtype
    c_pad = xc.shape[1]

    from snag_tpu.ops.pallas.gat_bwd import (edgewise_bwd,
                                             fused_gat_backward_row)

    gm = _build_gm(g_agg, g_rs, s_src, graph, dt)
    krow = jnp.where(graph.mask, graph.row, -1).astype(jnp.int32)

    if FUSED_BWD and graph.rt_n_tiles and pallas_available():
        from snag_tpu.ops.pallas.tile_segment import R as _R
        ts = _row_ts(graph)
        n_pad = ts.n_tiles * _R
        gm_full = jnp.pad(gm, ((0, n_pad - n), (0, 0)))
        # barrier: gm feeds the kernel tile, the col gather, and the spill
        # tail — without it XLA duplicates the concat into each consumer
        gm_full = jax.lax.optimization_barrier(gm_full)
        gcol = gm_full[graph.col]                    # (E, g_pad) by column
        xg, _ = _build_xg(x, s_dst)
        xs_full = jnp.pad(xg, ((0, n_pad - n), (0, 0)))
        dxd = fused_gat_backward_row(gm_full, xs_full, xc, gcol, krow,
                                     ts, h, c)
        d_x = dxd[:n, :c]
        d_s_dst = dxd[:n, c:c + h]
        d_s_src = dxd[:n, c + h:c + 2 * h]
        if ts.n_spill and not use_flat(ts):
            # edges past a tile's chunk cap: same math via the shared
            # edgewise helper on the few spilled rows, segment-summed in
            # (keys = the spilled edges' rows, already sorted)
            sel = jnp.asarray(ts.spill_sel)
            srow = jnp.asarray(ts.spill_row)
            mf_s = (krow[sel] >= 0).astype(jnp.float32)[:, None]
            ge_s = gm_full[jnp.maximum(krow[sel], 0)]
            _, d_score_f, _ = edgewise_bwd(ge_s, xc[sel], mf_s, h, c)
            d_s_src = d_s_src + jax.ops.segment_sum(
                d_score_f, srow, num_segments=graph.n_nodes,
                indices_are_sorted=True)
            _, d_score_r, d_xr = edgewise_bwd(
                gcol[sel], xs_full[jnp.maximum(krow[sel], 0)], mf_s, h, c)
            val_s = jnp.concatenate(
                [d_xr.astype(jnp.float32), d_score_r], axis=1)
            red_s = jax.ops.segment_sum(val_s, srow,
                                        num_segments=graph.n_nodes,
                                        indices_are_sorted=True)
            d_x = d_x + red_s[:, :c]
            d_s_dst = d_s_dst + red_s[:, c:c + h]
        return (d_x.astype(x.dtype), d_s_src.astype(s_src.dtype),
                d_s_dst.astype(s_dst.dtype), _graph_zeros(graph))

    # ---- XLA fallback: col-sorted edgewise + two tile/segment reduces ----
    ge = jax.lax.optimization_barrier(gm[graph.row_cs])       # (E, g_pad)
    xgc = xc[graph.col_order]                                 # (E, c_pad)
    _, d_score, d_xc = edgewise_bwd(ge, xgc,
                                    graph.mask_cs.astype(jnp.float32)[:, None],
                                    h, c)
    d_score = d_score.astype(jnp.float32)

    # ONE packed col reduce, already col-sorted: [d_xc | d_score]
    packed = jnp.concatenate(
        [d_xc, d_score.astype(dt),
         jnp.zeros((ge.shape[0], c_pad - c - h), dt)], axis=1)
    red = _reduce_edges(packed, graph.col_sorted, graph, use_row=False)
    d_x = red[:, :c].astype(x.dtype)
    d_s_dst = red[:, c:c + h].astype(s_dst.dtype)

    # narrow d_score back to row order for the d_s_src row reduce
    dsp = jnp.pad(d_score.astype(dt), ((0, 0), (0, 128 - h)))
    dsp_rs = dsp[graph.inv_col_order]
    d_s_src = _reduce_edges(dsp_rs, graph.row, graph,
                            use_row=True)[:, :h].astype(s_src.dtype)

    return d_x, d_s_src, d_s_dst, _graph_zeros(graph)


gat_attention.defvjp(_fwd, _bwd)
