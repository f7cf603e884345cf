"""Fully-fused GAT-layer backward kernel (col-sorted side).

The scatter-free GAT backward (ops/gat_attn_primitive._bwd) previously ran
its edgewise math — e = exp(-leakyrelu(score)), d_e = <x_col, g_agg_row>,
d_score, d_xc = sum_h e_h * g_agg_h — as ~6 XLA fusion passes over the
(E, 604)/(E, 384) gathered blocks, materializing a packed (E, 384)
intermediate for the column reduce (~1 ms per pass per layer at 330K
edges).  This kernel streams the SAME gathered blocks once and does
everything inside the column-tile reduce launch:

* per chunk: recompute e / d_e / d_score / d_xc in VMEM;
* one-hot matmul accumulates the packed [d_x | d_s_dst] output tile;
* d_score is emitted per (tile, chunk) slot, masked to the owning tile, so
  the row-side d_s_src reduce reads it back through ONE precomputed
  (E, 128) gather (graph.ct_slot_rs) — replacing the old pad + permute
  passes as well.

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
                                              _round_up, pallas_available)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _leaky(x):
    return jnp.where(x > 0, x, 0.2 * x)


def edgewise_bwd(ge, xgc, maskf, h: int, c: int):
    """(e, d_score, d_xc) from gathered row/col blocks — the single source
    of truth for the kernel, the spill tail, and the XLA fallback.

    ge:  (K, >=h*c+2h) [g_agg(h*c) | g_rs(h) | s_src(h)] in edge order;
    xgc: (K, >=c+h)    [x | s_dst];  maskf: (K, 1) f32 real-edge mask
    (float, not bool — Mosaic cannot minor-dim-reshape 1-bit vectors).
    The mask folds multiplicatively into e, which zeroes d_score too.
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


def _bwd_kernel(cb_ref, nc_ref, key_ref, krow_ref, ge_ref, xgc_ref,
                red_ref, ds_ref, *, h: int, c: int, c_pad: int):
    t = pl.program_id(0)
    cix = pl.program_id(1)

    @pl.when(cix == 0)
    def _():
        red_ref[...] = jnp.zeros_like(red_ref)

    active = cix < nc_ref[t]

    @pl.when(active)
    def _():
        keys = key_ref[0].reshape(-1)                        # (CHUNK,)
        # flatten THEN insert the minor dim on f32: Mosaic rejects both the
        # combined (1,4,128)->(512,1) reshape and minor-dim inserts on i1
        maskf = (krow_ref[0].reshape(-1) >= 0).astype(jnp.float32)[:, None]
        ge = ge_ref[...]
        xgc = xgc_ref[...]
        _, d_score, d_xc = edgewise_bwd(ge, xgc, maskf, h, c)

        packed = jnp.concatenate(
            [d_xc, d_score.astype(d_xc.dtype),
             jnp.zeros((CHUNK, c_pad - c - h), d_xc.dtype)], axis=1)
        local = keys - t * R
        colsR = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
        match = local[:, None] == colsR
        oh = match.astype(packed.dtype)
        red_ref[...] += jax.lax.dot_general(
            oh, packed, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (R, c_pad)

        # d_score, owned-tile entries only (overlapping chunks are visited
        # by two tiles; exactly one owns each edge)
        intile = jnp.any(match, axis=1)
        ds = jnp.pad(d_score, ((0, 0), (0, 128 - h)))
        ds_ref[...] = jnp.where(intile[:, None], ds, 0.0).astype(ds_ref.dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)


def fused_gat_backward(ge: jnp.ndarray,       # (E_pad, g_pad) gathered rows
                       xgc: jnp.ndarray,      # (E_pad, c_pad) gathered cols
                       krow_cs: jnp.ndarray,  # (E_pad,) row ids, -1 padding
                       col_sorted: jnp.ndarray,
                       ts: TileStructure,
                       n_nodes: int, n_heads: int, c_feat: int,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (red (n_nodes_pad, c_pad) f32 packed [d_x | d_s_dst],
    ds_slots (n_tiles*max_chunks*CHUNK, 128) d_score by (tile, chunk) slot)."""
    e_pad, c_pad = xgc.shape
    n_chunks = e_pad // CHUNK
    key_mat = col_sorted.astype(jnp.int32).reshape(n_chunks, CHUNK // 128, 128)
    krow_mat = krow_cs.astype(jnp.int32).reshape(n_chunks, CHUNK // 128, 128)

    def idx_edges(t, c, cb, nc):
        return (jnp.minimum(cb[t] + c, n_chunks - 1), 0)

    red, ds = pl.pallas_call(
        functools.partial(_bwd_kernel, h=n_heads, c=c_feat, c_pad=c_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts.n_tiles, ts.max_chunks),
            in_specs=[
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((CHUNK, ge.shape[1]), idx_edges),
                pl.BlockSpec((CHUNK, c_pad), idx_edges),
            ],
            out_specs=[
                pl.BlockSpec((R, c_pad), lambda t, c, *_: (t, 0)),
                pl.BlockSpec(
                    (CHUNK, 128),
                    functools.partial(
                        lambda mc, t, c, *_: (t * mc + c, 0), ts.max_chunks)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ts.n_tiles * R, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((ts.n_tiles * ts.max_chunks * CHUNK, 128),
                                 xgc.dtype),
        ],
    )(jnp.asarray(ts.chunk_base), jnp.asarray(ts.nc), key_mat, krow_mat,
      ge, xgc)
    return red, ds
