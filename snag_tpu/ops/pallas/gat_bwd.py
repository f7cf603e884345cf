"""Fully-fused GAT-layer backward kernel (row-tile side).

The GAT backward needs, per edge (i <- j):

    e        = exp(-leakyrelu(s_src[i] + s_dst[j])) * mask
    d_e      = <x[j], G[i]> + r[i]          (G, r = agg / rowsum cotangents)
    d_score  = -d_e * e * leaky'
    d_xc     = sum_h e_h * G[i, h]

then three segment reductions: d_s_src over rows, d_x / d_s_dst over
columns.  Two earlier formulations paid for edge transport: (1) pure-XLA
ran ~6 fusion passes over pre-gathered (E, 604)/(E, 384) blocks; (2) a
col-tile kernel still pre-gathered both blocks and moved d_score through a
padded (tile, chunk) slot buffer whose (E, 128) re-gather alone cost
~3 ms/layer (256-byte rows gather an order of magnitude slower than
wide rows, traced).

This kernel works in ROW-sorted order, mirroring the forward
(ops/pallas/gat_attention.py) so every row-side operand is TILE-loaded
instead of edge-gathered:

* gm = [G | r | s_src] enters as the output tile's (R, g_pad) block —
  no (E, 604) gather, no pad pass; rows broadcast onto edges by the same
  one-hot matmul that does the reductions;
* xc = [x | s_dst][col] in row-sorted edge order is the SAME gather the
  forward already materialized — reused as a VJP residual, so the
  backward performs no wide gather at all;
* d_s_src accumulates in-kernel into the (R, 128) tile block (exactly
  like the forward's rowsum) — the slot buffer, its re-gather, and the
  separate row-tile reduce launch all disappear;
* the packed [d_xc | d_score] edge block streams out per chunk; the
  column-side reduction then needs ONE (E, c_pad) permutation gather
  (row -> col order) + the standard col-tile reduce.

Boundary chunks shared by two consecutive tiles map to the same output
block; TPU grids run sequentially and all visits to a block are
consecutive, so the second tile accumulates into the still-resident
block (``fv`` marks first visits).  Edges past a tile's chunk cap are
rt-spill positions, filled by the caller's XLA tail.

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
    """(e, d_score, d_xc) from per-edge row/col blocks — the single source
    of truth for the kernel, the spill tail, and the XLA fallback.

    ge:  (K, >=h*c+2h) [G(h*c) | r(h) | s_src(h)] in edge order;
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


def _bwd_row_kernel(cb_ref, nc_ref, fv_ref, krow_ref, gm_ref, xc_ref,
                    dss_ref, packed_ref, *, h: int, c: int, c_pad: int):
    t = pl.program_id(0)
    cix = pl.program_id(1)

    @pl.when(cix == 0)
    def _():
        dss_ref[...] = jnp.zeros_like(dss_ref)

    active = cix < nc_ref[t]

    @pl.when(active)
    def _():
        rows = krow_ref[0].reshape(-1)                       # (CHUNK,)
        local = rows - t * R                                 # pad -1 -> <0
        colsR = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
        match = local[:, None] == colsR                      # (CHUNK, R)
        oh = match.astype(gm_ref.dtype)

        # broadcast the tile's [G | r | s_src] rows onto edges (one-hot
        # matmul; exact for bf16 inputs — rows are copied, not summed)
        ge = jax.lax.dot_general(
            oh, gm_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(gm_ref.dtype)
        maskf = jnp.any(match, axis=1).astype(jnp.float32)[:, None]
        _, d_score, d_xc = edgewise_bwd(ge, xc_ref[...], maskf, h, c)

        # d_s_src: reduce d_score onto the owning tile rows (as the
        # forward does for rowsum)
        ds_wide = jnp.pad(d_score, ((0, 0), (0, 128 - h))).astype(oh.dtype)
        dss_ref[...] += jax.lax.dot_general(
            oh, ds_wide, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (R, 128)

        # packed [d_xc | d_score | 0] per edge; off-tile edges carry zeros
        # (e == 0 there), so the boundary-chunk accumulation is disjoint
        pk = jnp.concatenate(
            [d_xc, d_score.astype(d_xc.dtype),
             jnp.zeros((CHUNK, c_pad - c - h), d_xc.dtype)], axis=1)
        first = jnp.logical_or(cix > 0, fv_ref[t] != 0)

        @pl.when(first)
        def _():
            packed_ref[...] = pk

        @pl.when(jnp.logical_not(first))
        def _():
            packed_ref[...] += pk


def fused_gat_backward_row(
        gm: jnp.ndarray,       # (n_tiles*R, g_pad) [G | r | s_src] by node
        xc: jnp.ndarray,       # (E_pad, c_pad) [x | s_dst] row-sorted edges
        krow: jnp.ndarray,     # (E_pad,) row ids, -1 padding
        ts: TileStructure,
        n_heads: int, c_feat: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dss (n_tiles*R, 128) f32 d_s_src tiles,
    packed (E_pad, c_pad) [d_xc | d_score] in row-sorted edge order;
    rt-spill positions are NOT written — the caller's tail fills them)."""
    e_pad, c_pad = xc.shape
    n_chunks = e_pad // CHUNK
    krow_mat = krow.astype(jnp.int32).reshape(n_chunks, CHUNK // 128, 128)
    cb = jnp.asarray(ts.chunk_base)
    nc = jnp.asarray(ts.nc)
    # first_visit[t]: tile t's first chunk is NOT shared with tile t-1's
    # last visited chunk (self-loops guarantee nc >= 1 for every tile)
    fv = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (cb[1:] != cb[:-1] + nc[:-1] - 1).astype(jnp.int32)])

    def idx_edges(t, c, cb, nc, fv):
        return (jnp.minimum(cb[t] + c, n_chunks - 1), 0)

    def idx_packed(t, c, cb, nc, fv):
        # inactive cells clamp to the tile's last active chunk so block
        # visits stay consecutive across the tile boundary
        return (jnp.minimum(cb[t] + c, cb[t] + nc[t] - 1), 0)

    dss, packed = pl.pallas_call(
        functools.partial(_bwd_row_kernel, h=n_heads, c=c_feat, c_pad=c_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ts.n_tiles, ts.max_chunks),
            in_specs=[
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc, fv: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((R, gm.shape[1]),
                             lambda t, c, cb, nc, fv: (t, 0)),   # gm tile
                pl.BlockSpec((CHUNK, c_pad), idx_edges),         # xc chunk
            ],
            out_specs=[
                pl.BlockSpec((R, 128), lambda t, c, *_: (t, 0)),
                pl.BlockSpec((CHUNK, c_pad), idx_packed),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ts.n_tiles * R, 128), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, c_pad), xc.dtype),
        ],
    )(cb, nc, fv, krow_mat, gm, xc)
    return dss, packed
