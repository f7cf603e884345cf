"""Fused GAT aggregation primitive with a scatter-free custom VJP.

``gat_aggregate(x, e, graph)`` computes, per attention head h:

    agg[i, h, :] = sum over edges (i <- j)  e[edge, h] * x[j, :]
    rowsum[i, h] = sum over edges (i <- j)  e[edge, h]

i.e. the two ``SpecialSpmm`` calls of the reference GAT layer
(SNAG_MMEA/model/layers.py:81-85) for ALL heads at once.  Forward runs the
row-tile Pallas kernel (ops/pallas/tile_segment.py) on TPU and a plain
segment_sum elsewhere; the backward is scatter-free:

    d_xc[edge]  = sum_h e[edge, h] * g_agg[row[edge], h, :]   (gather)
    d_e[edge,h] = <x[col[edge]], g_agg[row[edge], h]> + g_rs[row[edge], h]
    d_x[j]      = sum over edges (i <- j) d_xc[edge]          (col-tile kernel)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.pallas.tile_segment import (TileStructure,
                                              pallas_available,
                                              tile_weighted_segment_sum,
                                              xla_weighted_segment_sum)


def _row_reduce(xc, e, graph):
    """(E, C) x (E, H) -> ((N, H, C), (N, H)) over the row-sorted order."""
    if graph.rt_n_tiles and pallas_available():
        ts = TileStructure(
            chunk_base=graph.rt_chunk_base, nc=graph.rt_nc,
            spill_sel=graph.rt_spill_sel, spill_row=graph.rt_spill_row,
            n_tiles=graph.rt_n_tiles, max_chunks=graph.rt_max_chunks,
            n_spill=graph.rt_n_spill)
        return tile_weighted_segment_sum(xc, e, graph.row, ts, graph.n_nodes)
    return xla_weighted_segment_sum(xc, e, graph.row, graph.n_nodes)


def _col_reduce(vals_cs, cols_sorted, graph):
    """(E, C) unweighted reduce over the col-sorted order -> (N, C)."""
    ones = jnp.ones((vals_cs.shape[0], 1), vals_cs.dtype)
    if graph.ct_n_tiles and pallas_available():
        ts = TileStructure(
            chunk_base=graph.ct_chunk_base, nc=graph.ct_nc,
            spill_sel=graph.ct_spill_sel, spill_row=graph.ct_spill_row,
            n_tiles=graph.ct_n_tiles, max_chunks=graph.ct_max_chunks,
            n_spill=graph.ct_n_spill)
        agg, _ = tile_weighted_segment_sum(vals_cs, ones, cols_sorted, ts,
                                           graph.n_nodes)
    else:
        agg, _ = xla_weighted_segment_sum(vals_cs, ones, cols_sorted,
                                          graph.n_nodes)
    return agg[:, 0, :]


@jax.custom_vjp
def gat_aggregate(x: jnp.ndarray, e: jnp.ndarray, graph
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (N, C) bf16/f32; e: (E_pad, H) with 0 on padded edges.
    Returns (agg (N, H, C) f32, rowsum (N, H) f32).

    ``graph`` is a pytree argument (its leaves may be tracers under jit),
    so it sits in a differentiable slot and gets zero cotangents."""
    return _gat_fwd(x, e, graph)[0]


def _gat_fwd(x, e, graph):
    xc = x[graph.col]                                # (E, C), caller's dtype
    out = _row_reduce(xc, e, graph)
    return out, (x, e, graph)


def _graph_zeros(graph):
    def z(a):
        if a is None:
            return None
        if jnp.issubdtype(jnp.result_type(a), jnp.floating):
            return jnp.zeros(a.shape, jnp.result_type(a))
        return np.zeros(a.shape, dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(z, graph)


def _gat_bwd(res, cts):
    x, e, graph = res
    g_agg, g_rs = cts
    n, h = g_rs.shape
    c = x.shape[1]
    gm = g_agg.astype(x.dtype).reshape(n, h * c)
    ge = gm[graph.row]                               # (E, H*C) gather
    xc = x[graph.col]
    eb = e.astype(x.dtype)

    # d_xc = sum_h e_h * g_agg[row]  -> (E, C); then reduce over cols
    d_xc = jnp.zeros((xc.shape[0], c), x.dtype)
    d_e_parts = []
    for i in range(h):
        gei = ge[:, i * c:(i + 1) * c]
        d_xc = d_xc + eb[:, i:i + 1] * gei
        # d_e_h = <xc, g_agg_h[row]> + g_rs[row, h]
        d_e_parts.append(jnp.sum(xc.astype(jnp.float32)
                                 * gei.astype(jnp.float32), axis=1))
    d_e = jnp.stack(d_e_parts, axis=1) + g_rs[graph.row]
    d_e = jnp.where(graph.mask[:, None], d_e, 0.0).astype(e.dtype)

    d_x = _col_reduce(d_xc[graph.col_order], graph.col_sorted, graph)
    return d_x.astype(x.dtype), d_e, _graph_zeros(graph)


gat_aggregate.defvjp(_gat_fwd, _gat_bwd)
