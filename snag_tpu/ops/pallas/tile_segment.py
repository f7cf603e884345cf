"""Row-tile weighted segment reduction — the GAT aggregation kernel.

Replaces the reference's ``SpecialSpmm`` sparse matmul (the two
spmm-per-head hot loop, SNAG_MMEA/model/layers.py:9-33, 68-94) with a
single Pallas TPU kernel computing, for every head h:

    agg[i, h, :]  = sum over edges (i <- j)  e[edge, h] * x[j, :]
    rowsum[i, h]  = sum over edges (i <- j)  e[edge, h]

Design (why this shape): the previous CSR formulation gathered packed
(E, H*F+H) edge rows and reduced them through a take+sum whose
(N, width, C) intermediate XLA materialized at f32 — ~5 GB of HBM traffic
per layer (profiled).  This kernel instead:

* grids over OUTPUT tiles of R=128 rows — each tile's (R, H*C) f32
  accumulator lives in VMEM and is written to HBM exactly once;
* streams the tile's edges in chunks of 512 via scalar-prefetch block
  indexing (edges are row-sorted, so a tile's edges are contiguous);
* builds the scatter matrix on the fly as an e-weighted one-hot and
  reduces on the MXU:  part_h = (onehot * e_h)^T @ x_cols;
* spills hub tiles' excess edges (beyond MAX_CHUNKS) to a small XLA
  ``segment_sum`` tail, keeping the static grid tight.

Per layer at DBP15K scale this reads the (E, C) neighbour block ~1.5x
and writes (N, H*C) once — ~0.4 GB vs the CSR path's ~5 GB.

The backward is pure-XLA (see ops/gat_agg.py): d_x is the same reduction
over the col-sorted edge order (this kernel again, H=1, unit weights),
d_e is an edge-wise dot — no scatters anywhere.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

import os as _os

R = int(_os.environ.get("SNAG_GAT_R", "128"))   # output rows per tile
# edges per streamed chunk: the kernels pay a fixed ~2.7 us per grid step
# (measured via the flat-grid A/B), so bigger chunks amortize overhead at
# the price of more boundary waste (each tile's edge range rounds to CHUNK)
CHUNK = int(_os.environ.get("SNAG_GAT_CHUNK", "512"))
if CHUNK <= 0 or CHUNK % 128:
    raise ValueError(
        f"SNAG_GAT_CHUNK={CHUNK}: must be a positive multiple of 128 "
        "(edge chunks reshape to (CHUNK//128, 128) lanes)")
if R <= 0 or R % 8:
    raise ValueError(
        f"SNAG_GAT_R={R}: must be a positive multiple of 8 "
        "(output tiles must align to the f32 sublane count)")
E_LANES = 128    # lane width of the edge-weight array (H <= E_LANES)

# Grid formulation for the segment/GAT kernels.  The original ("tiled")
# grid is (n_tiles, max_chunks): rectangular, so tiles with fewer chunks
# than the cap burn bubble steps with dummy DMAs (~31% of the grid at the
# DBP15K bench graph: 940 steps for 646 real chunks), and tiles above the
# cap spill to an XLA segment_sum tail.  The "flat" grid enumerates only
# the real (tile, chunk) work items — no bubbles, no cap, no spill.
# Module flag for in-process A/B (scripts/ab_gat_flat.py).
FLAT_GRID = True


def pallas_available() -> bool:
    if not _PALLAS_IMPORTED:
        return False
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon") or "tpu" in plat


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class TileStructure:
    """Static per-tile chunk ranges over a sorted edge key array.

    chunk_base[t]: first CHUNK-aligned chunk index of tile t's edge range;
    nc[t]:         number of chunks tile t consumes (<= max_chunks);
    spill_sel/spill_row: edge positions (and their keys) beyond the chunk
    cap, reduced by a segment_sum tail.  n_tiles * R >= n_nodes.
    """
    chunk_base: np.ndarray      # (n_tiles,) int32
    nc: np.ndarray              # (n_tiles,) int32
    spill_sel: np.ndarray       # (S_pad,) int32 positions into edge arrays
    spill_row: np.ndarray       # (S_pad,) int32 sorted keys
    n_tiles: int
    max_chunks: int
    n_spill: int
    # flat-grid work list (uncapped — covers EVERY chunk incl. would-be
    # spill, so flat mode never runs the spill tail); None on structures
    # built before the flat grid existed (falls back to the tiled grid)
    flat_tile: Optional[np.ndarray] = None   # (n_flat,) int32 tile id
    flat_chunk: Optional[np.ndarray] = None  # (n_flat,) int32 chunk index
    flat_first: Optional[np.ndarray] = None  # (n_flat,) 1 = tile's first
    n_flat: int = 0


def build_tile_structure(keys: np.ndarray, starts: np.ndarray, n_nodes: int,
                         e_pad: int, cap_quantile: float = 0.97,
                         hard_cap: int = 16) -> TileStructure:
    """Host-side tile ranges over row-sorted ``keys`` (len e_pad, padding
    keys = n_nodes-1).  ``starts[r]`` = first edge position of row r."""
    n_tiles = _round_up(n_nodes, R) // R
    first = np.empty(n_tiles + 1, dtype=np.int64)
    for t in range(n_tiles):
        r = t * R
        first[t] = starts[r] if r < n_nodes else e_pad
    first[n_tiles] = e_pad
    aligned = (first[:-1] // CHUNK) * CHUNK
    needed = np.maximum(0, -(-(first[1:] - aligned) // CHUNK)).astype(np.int64)
    q = int(np.quantile(needed, cap_quantile)) if len(needed) else 1
    max_chunks = int(min(max(q, 1), hard_cap))
    nc = np.minimum(needed, max_chunks).astype(np.int32)

    spill = []
    for t in np.nonzero(needed > max_chunks)[0]:
        lo = aligned[t] + max_chunks * CHUNK
        hi = first[t + 1]
        spill.append(np.arange(lo, hi, dtype=np.int64))
    if spill:
        sel = np.concatenate(spill)
    else:
        sel = np.empty(0, dtype=np.int64)
    n_spill = len(sel)
    s_pad = _round_up(max(n_spill, 1), 256)
    spill_sel = np.full(s_pad, e_pad - 1, dtype=np.int32)
    spill_row = np.full(s_pad, n_nodes - 1, dtype=np.int32)
    if n_spill:
        spill_sel[:n_spill] = sel
        spill_row[:n_spill] = keys[sel]

    # flat work list: every real (tile, chunk) pair, uncapped.  A tile
    # with zero chunks still emits one item (its rows match no edge in
    # the dummy chunk, so the kernel writes a zero block) — every output
    # tile must be visited exactly one consecutive run.
    cb = (aligned // CHUNK).astype(np.int64)
    nflat_t = np.maximum(needed, 1)
    n_flat = int(nflat_t.sum())
    flat_tile = np.repeat(np.arange(n_tiles, dtype=np.int32), nflat_t)
    flat_chunk = (cb.repeat(nflat_t)
                  + (np.arange(n_flat) -
                     np.repeat(np.cumsum(nflat_t) - nflat_t, nflat_t))
                  ).astype(np.int32)
    n_chunks_total = max(e_pad // CHUNK, 1)
    flat_chunk = np.minimum(flat_chunk, n_chunks_total - 1)
    flat_first = np.zeros(n_flat, dtype=np.int32)
    flat_first[np.cumsum(nflat_t) - nflat_t] = 1

    return TileStructure(chunk_base=(aligned // CHUNK).astype(np.int32),
                         nc=nc, spill_sel=spill_sel, spill_row=spill_row,
                         n_tiles=n_tiles, max_chunks=max_chunks,
                         n_spill=n_spill, flat_tile=flat_tile,
                         flat_chunk=flat_chunk, flat_first=flat_first,
                         n_flat=n_flat)


def use_flat(ts: TileStructure) -> bool:
    """True when this call should run the flat grid (see FLAT_GRID)."""
    return bool(FLAT_GRID and ts.n_flat and ts.flat_tile is not None)


def _kernel(cb_ref, nc_ref, row_ref, xc_ref, e_ref, out_ref, rs_ref,
            *, n_heads: int, c_pad: int):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        rs_ref[...] = jnp.zeros_like(rs_ref)

    @pl.when(c < nc_ref[t])
    def _():
        rows = row_ref[0].reshape(-1)                         # (CHUNK,)
        local = rows - t * R
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
        oh = (local[:, None] == cols).astype(xc_ref.dtype)    # (CHUNK, R)
        e = e_ref[...]                                        # (CHUNK, 128)
        xc = xc_ref[...]                                      # (CHUNK, C)
        for h in range(n_heads):
            ohw = oh * e[:, h][:, None]
            part = jax.lax.dot_general(
                ohw, xc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (R, C)
            out_ref[:, h * c_pad:(h + 1) * c_pad] += part
        rs_part = jax.lax.dot_general(
            oh, e, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (R, 128)
        rs_ref[...] += rs_part


def _kernel_flat(ft_ref, fc_ref, ff_ref, row_ref, xc_ref, e_ref, out_ref,
                 rs_ref, *, n_heads: int, c_pad: int):
    i = pl.program_id(0)
    t = ft_ref[i]

    @pl.when(ff_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        rs_ref[...] = jnp.zeros_like(rs_ref)

    rows = row_ref[0].reshape(-1)                             # (CHUNK,)
    local = rows - t * R
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
    oh = (local[:, None] == cols).astype(xc_ref.dtype)        # (CHUNK, R)
    e = e_ref[...]                                            # (CHUNK, 128)
    xc = xc_ref[...]                                          # (CHUNK, C)
    for h in range(n_heads):
        ohw = oh * e[:, h][:, None]
        part = jax.lax.dot_general(
            ohw, xc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (R, C)
        out_ref[:, h * c_pad:(h + 1) * c_pad] += part
    rs_part = jax.lax.dot_general(
        oh, e, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (R, 128)
    rs_ref[...] += rs_part


def flat_scalars(ts: TileStructure):
    return (jnp.asarray(ts.flat_tile), jnp.asarray(ts.flat_chunk),
            jnp.asarray(ts.flat_first))


def tile_weighted_segment_sum(
        xc: jnp.ndarray,          # (E_pad, C) bf16 — gathered neighbour rows
        e: jnp.ndarray,           # (E_pad, H) edge weights (0 on padding)
        row_sorted: jnp.ndarray,  # (E_pad,) int32 sorted keys
        ts: TileStructure,
        n_nodes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (agg (n_nodes, H, C) f32, rowsum (n_nodes, H) f32)."""
    e_pad, c_in = xc.shape
    h = e.shape[1]
    assert e_pad % CHUNK == 0, "edge padding must be a CHUNK multiple"
    c_pad = _round_up(c_in, 128)
    if c_pad != c_in:
        xc = jnp.pad(xc, ((0, 0), (0, c_pad - c_in)))
    # compute dtype follows the caller (bf16 production, f32 parity mode);
    # single pad fusion (zeros + .at[].set() costs a full extra DUS pass)
    e_wide = jnp.pad(e.astype(xc.dtype), ((0, 0), (0, E_LANES - h)))
    # (n_chunks, CHUNK//128, 128): TPU block shapes need the last two dims
    # (8k, 128)-aligned or full — a flat (1, CHUNK) block is rejected
    row_mat = row_sorted.astype(jnp.int32).reshape(
        e_pad // CHUNK, CHUNK // 128, 128)
    n_chunks = e_pad // CHUNK

    if use_flat(ts):
        out, rs = pl.pallas_call(
            functools.partial(_kernel_flat, n_heads=h, c_pad=c_pad),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ts.n_flat,),
                in_specs=[
                    pl.BlockSpec((1, CHUNK // 128, 128),
                                 lambda i, ft, fc, ff: (fc[i], 0, 0)),
                    pl.BlockSpec((CHUNK, c_pad),
                                 lambda i, ft, fc, ff: (fc[i], 0)),   # xc
                    pl.BlockSpec((CHUNK, E_LANES),
                                 lambda i, ft, fc, ff: (fc[i], 0)),   # e
                ],
                out_specs=[
                    pl.BlockSpec((R, h * c_pad),
                                 lambda i, ft, fc, ff: (ft[i], 0)),
                    pl.BlockSpec((R, E_LANES),
                                 lambda i, ft, fc, ff: (ft[i], 0)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((ts.n_tiles * R, h * c_pad),
                                     jnp.float32),
                jax.ShapeDtypeStruct((ts.n_tiles * R, E_LANES), jnp.float32),
            ],
        )(*flat_scalars(ts), row_mat, xc, e_wide)
        # flat mode covers every chunk — no spill tail
        return (out[:n_nodes].reshape(n_nodes, h, c_pad)[:, :, :c_in],
                rs[:n_nodes, :h])

    cb = jnp.asarray(ts.chunk_base)
    nc = jnp.asarray(ts.nc)

    def idx_edges(t, c, cb_ref, nc_ref):
        return (jnp.minimum(cb_ref[t] + c, n_chunks - 1), 0)

    out, rs = pl.pallas_call(
        functools.partial(_kernel, n_heads=h, c_pad=c_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts.n_tiles, ts.max_chunks),
            in_specs=[
                pl.BlockSpec((1, CHUNK // 128, 128),
                             lambda t, c, cb, nc: (
                                 jnp.minimum(cb[t] + c, n_chunks - 1), 0, 0)),
                pl.BlockSpec((CHUNK, c_pad), idx_edges),        # xc
                pl.BlockSpec((CHUNK, E_LANES), idx_edges),      # e
            ],
            out_specs=[
                pl.BlockSpec((R, h * c_pad), lambda t, c, *_: (t, 0)),
                pl.BlockSpec((R, E_LANES), lambda t, c, *_: (t, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ts.n_tiles * R, h * c_pad), jnp.float32),
            jax.ShapeDtypeStruct((ts.n_tiles * R, E_LANES), jnp.float32),
        ],
    )(cb, nc, row_mat, xc, e_wide)

    agg = out[:n_nodes].reshape(n_nodes, h, c_pad)[:, :, :c_in]
    rowsum = rs[:n_nodes, :h]

    if ts.n_spill:
        sel = jnp.asarray(ts.spill_sel)
        srow = jnp.asarray(ts.spill_row)
        xs = xc[sel][:, :c_in].astype(jnp.float32)              # (S, C)
        es = e_wide[sel][:, :h].astype(jnp.float32)             # (S, H)
        tail = jax.ops.segment_sum(
            (es[:, :, None] * xs[:, None, :]).reshape(sel.shape[0], -1),
            srow, num_segments=n_nodes, indices_are_sorted=True)
        agg = agg + tail.reshape(n_nodes, h, c_in)
        rowsum = rowsum + jax.ops.segment_sum(
            es, srow, num_segments=n_nodes, indices_are_sorted=True)
    return agg, rowsum


def xla_weighted_segment_sum(
        xc: jnp.ndarray, e: jnp.ndarray, row_sorted: jnp.ndarray,
        n_nodes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference/fallback implementation (CPU tests, non-TPU backends)."""
    h = e.shape[1]
    ef = e.astype(jnp.float32)
    xf = xc.astype(jnp.float32)
    vals = (ef[:, :, None] * xf[:, None, :]).reshape(xc.shape[0], -1)
    agg = jax.ops.segment_sum(vals, row_sorted, num_segments=n_nodes,
                              indices_are_sorted=True)
    rowsum = jax.ops.segment_sum(ef, row_sorted, num_segments=n_nodes,
                                 indices_are_sorted=True)
    return agg.reshape(n_nodes, h, xc.shape[1]), rowsum
