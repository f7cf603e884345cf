"""Graph preprocessing: triples -> padded, sorted edge lists.

XLA has no sparse tensors; every graph op in this framework is a
``segment_sum`` / ``segment_max`` over a *sorted, capacity-padded edge list*.
This module builds that representation on the host with numpy.

Semantics mirror the reference adjacency construction
(SNAG_MMEA/src/utils.py:327-362 ``get_adjr`` + :220-226 ``normalize_adj``):

* undirected multiplicity-weighted adjacency: every (h, t) triple pair with
  h != t contributes its multiplicity in both directions;
* self-loops with weight 1 on every node;
* symmetric normalisation D^-1/2 A D^-1/2.

Differences by design (TPU-first):

* output is a struct-of-arrays edge list sorted by destination row
  (``indices_are_sorted=True`` segment ops), padded to a lane-aligned
  capacity with zero-weight masked edges so shapes are static under jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence, Tuple

import jax
import numpy as np

EDGE_PAD_MULTIPLE = 1024


def _edge_pad_multiple() -> int:
    """Edge arrays must pad to a multiple of the kernel CHUNK (the Pallas
    block specs partition them in CHUNK units); lcm with the default keeps
    non-power-of-two SNAG_GAT_CHUNK overrides (e.g. 768) working."""
    import math
    from snag_tpu.ops.pallas.tile_segment import CHUNK
    return EDGE_PAD_MULTIPLE * CHUNK // math.gcd(EDGE_PAD_MULTIPLE, CHUNK)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Graph:
    """Padded edge-list adjacency with CSR gather structure.

    ``out[i] = sum over edges e with row[e]==i of w[e] * h[col[e]]``.
    Edges are sorted by ``row``; entries past ``n_edges`` are padding with
    ``w == 0`` and ``mask == False``.

    The CSR fields drive the scatter-free aggregation (ops/segment.py
    ``csr_gather_segment_sum``): TPU scatters serialize per update, so the
    head of each adjacency row (up to ``gather_width`` edges) is reduced by
    a dense gather+sum and only the hub tail (``tail_sel`` edge positions)
    goes through a small segment_sum.

    * starts:   (N,) first edge position of each row
    * deg:      (N,) row degree
    * tail_sel: (T_pad,) edge positions beyond gather_width, row-sorted
    * tail_row: (T_pad,) their rows (padding rows point at n_nodes-1 with
                tail_sel pointing at a guaranteed-zero padded edge)
    * gather_width / n_tail: static

    The col_* fields are the same structure over the column index (the
    in-edge CSR), used for the backward of node->edge gathers
    (ops/segment.py ``edge_gather_col``): ``col_order`` permutes edges into
    col-sorted order; col_starts/col_deg/col_tail_* index into that order.
    """

    n_nodes: int
    n_edges: int          # real (unpadded) edge count, self-loops included
    row: np.ndarray       # (E_pad,) int32, sorted ascending
    col: np.ndarray       # (E_pad,) int32
    w: np.ndarray         # (E_pad,) float32 — sym-normalized; 0 on padding
    mask: np.ndarray      # (E_pad,) bool
    starts: np.ndarray = None    # (N,) int32
    deg: np.ndarray = None       # (N,) int32
    tail_sel: np.ndarray = None  # (T_pad,) int32
    tail_row: np.ndarray = None  # (T_pad,) int32
    gather_width: int = 0
    n_tail: int = 0
    col_order: np.ndarray = None      # (E_pad,) int32
    col_sorted: np.ndarray = None     # (E_pad,) int32 = col[col_order]
    row_cs: np.ndarray = None         # (E_pad,) int32 = row[col_order]
    inv_col_order: np.ndarray = None  # (E_pad,) int32 inverse permutation
    mask_cs: np.ndarray = None        # (E_pad,) bool = mask[col_order]
    col_starts: np.ndarray = None     # (N,) int32
    col_deg: np.ndarray = None        # (N,) int32
    col_tail_sel: np.ndarray = None   # (Tc_pad,) positions in col order
    col_tail_row: np.ndarray = None   # (Tc_pad,) col value (target node)
    col_gather_width: int = 0

    # row/col tile structures for the Pallas GAT aggregation kernel
    # (ops/pallas/tile_segment.py): per-128-row-tile chunk ranges + hub
    # spill lists; rt_* over row-sorted edges, ct_* over col-sorted order.
    rt_chunk_base: np.ndarray = None  # (n_tiles,) int32
    rt_nc: np.ndarray = None          # (n_tiles,) int32
    rt_spill_sel: np.ndarray = None   # (S_pad,) int32
    rt_spill_row: np.ndarray = None   # (S_pad,) int32
    rt_n_tiles: int = 0
    rt_max_chunks: int = 0
    rt_n_spill: int = 0
    ct_chunk_base: np.ndarray = None
    ct_nc: np.ndarray = None
    ct_spill_sel: np.ndarray = None
    ct_spill_row: np.ndarray = None
    ct_n_tiles: int = 0
    ct_max_chunks: int = 0
    ct_n_spill: int = 0
    # flat-grid work lists (tile_segment.py FLAT_GRID): one entry per real
    # (tile, chunk) pair, uncapped — the kernels iterate exactly these
    rt_flat_tile: np.ndarray = None   # (rt_n_flat,) int32
    rt_flat_chunk: np.ndarray = None  # (rt_n_flat,) int32
    rt_flat_first: np.ndarray = None  # (rt_n_flat,) int32 1 = tile's first
    rt_n_flat: int = 0
    ct_flat_tile: np.ndarray = None
    ct_flat_chunk: np.ndarray = None
    ct_flat_first: np.ndarray = None
    ct_n_flat: int = 0

    @property
    def e_pad(self) -> int:
        return int(self.row.shape[0])


# Graph is a pytree: edge arrays are leaves (jit arguments, not baked-in
# constants), node/edge counts are static aux data.
jax.tree_util.register_pytree_node(
    Graph,
    lambda g: ((g.row, g.col, g.w, g.mask, g.starts, g.deg, g.tail_sel,
                g.tail_row, g.col_order, g.col_starts, g.col_deg,
                g.col_tail_sel, g.col_tail_row, g.rt_chunk_base, g.rt_nc,
                g.rt_spill_sel, g.rt_spill_row, g.ct_chunk_base, g.ct_nc,
                g.ct_spill_sel, g.ct_spill_row, g.col_sorted, g.row_cs,
                g.inv_col_order, g.mask_cs, g.rt_flat_tile, g.rt_flat_chunk,
                g.rt_flat_first, g.ct_flat_tile, g.ct_flat_chunk,
                g.ct_flat_first),
               (g.n_nodes, g.n_edges, g.gather_width, g.n_tail,
                g.col_gather_width, g.rt_n_tiles, g.rt_max_chunks,
                g.rt_n_spill, g.ct_n_tiles, g.ct_max_chunks, g.ct_n_spill,
                g.rt_n_flat, g.ct_n_flat)),
    lambda aux, leaves: Graph(
        n_nodes=aux[0], n_edges=aux[1], row=leaves[0], col=leaves[1],
        w=leaves[2], mask=leaves[3], starts=leaves[4], deg=leaves[5],
        tail_sel=leaves[6], tail_row=leaves[7], gather_width=aux[2],
        n_tail=aux[3], col_order=leaves[8], col_starts=leaves[9],
        col_deg=leaves[10], col_tail_sel=leaves[11], col_tail_row=leaves[12],
        col_gather_width=aux[4], rt_chunk_base=leaves[13], rt_nc=leaves[14],
        rt_spill_sel=leaves[15], rt_spill_row=leaves[16],
        rt_n_tiles=aux[5], rt_max_chunks=aux[6], rt_n_spill=aux[7],
        ct_chunk_base=leaves[17], ct_nc=leaves[18], ct_spill_sel=leaves[19],
        ct_spill_row=leaves[20], ct_n_tiles=aux[8], ct_max_chunks=aux[9],
        ct_n_spill=aux[10], col_sorted=leaves[21], row_cs=leaves[22],
        inv_col_order=leaves[23], mask_cs=leaves[24],
        rt_flat_tile=leaves[25], rt_flat_chunk=leaves[26],
        rt_flat_first=leaves[27], ct_flat_tile=leaves[28],
        ct_flat_chunk=leaves[29], ct_flat_first=leaves[30],
        rt_n_flat=aux[11], ct_n_flat=aux[12]),
)


def _csr_structure(keys: np.ndarray, n_nodes: int, e_pad: int):
    """CSR head/tail structure over sorted segment keys (see Graph doc)."""
    deg = np.bincount(keys, minlength=n_nodes).astype(np.int32)
    starts = np.zeros(n_nodes, dtype=np.int32)
    starts[1:] = np.cumsum(deg)[:-1]
    d97 = int(np.quantile(deg, 0.97))
    width = int(min(max(_round_up(max(d97, 1), 8), 8), 128))
    pos = np.arange(len(keys)) - starts[keys]
    tail_positions = np.nonzero(pos >= width)[0].astype(np.int32)
    n_tail = len(tail_positions)
    t_pad = _round_up(max(n_tail, 1), 256)
    tail_sel = np.full(t_pad, e_pad - 1, dtype=np.int32)
    tail_row = np.full(t_pad, n_nodes - 1, dtype=np.int32)
    tail_sel[:n_tail] = tail_positions
    tail_row[:n_tail] = keys[tail_positions]
    return starts, deg, tail_sel, tail_row, width, n_tail


def build_graph(n_nodes: int, triples: Sequence[Tuple[int, int, int]],
                pad_multiple: int = 0) -> Graph:
    """Build the normalized, padded, row-sorted edge list from raw triples."""
    # multiplicity-weighted undirected pairs, h != t (get_adjr).  Keyed
    # UNDIRECTED: the reference mirrors its directed dict into both
    # directions and then coalesces through scipy's normalize_adj matmuls
    # (src/utils.py:327-362, 220-226), so when both (a,b) and (b,a) occur
    # as triples the final edge list holds each direction ONCE with the
    # summed multiplicity — keeping directed duplicates would double those
    # neighbors' attention mass in the GAT (it consumes the edge multiset,
    # layers.py:72-83).
    pairs = {}
    for h, _, t in triples:
        if h == t:
            continue
        key = (int(h), int(t)) if h <= t else (int(t), int(h))
        pairs[key] = pairs.get(key, 0) + 1

    n_real = 2 * len(pairs) + n_nodes
    rows = np.empty(n_real, dtype=np.int64)
    cols = np.empty(n_real, dtype=np.int64)
    vals = np.empty(n_real, dtype=np.float64)
    i = 0
    for (h, t), c in pairs.items():
        rows[i], cols[i], vals[i] = h, t, c
        rows[i + 1], cols[i + 1], vals[i + 1] = t, h, c
        i += 2
    # self-loops
    rows[i:] = np.arange(n_nodes)
    cols[i:] = np.arange(n_nodes)
    vals[i:] = 1.0

    # duplicate (h,t) COO entries are implicitly summed by the reference's
    # scipy coo_matrix; the dict above already coalesced them.

    # symmetric normalization D^-1/2 A D^-1/2 (normalize_adj)
    deg = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(deg, rows, vals)
    with np.errstate(divide="ignore"):
        dinv = np.power(deg, -0.5)
    dinv[np.isinf(dinv)] = 0.0
    norm_vals = vals * dinv[rows] * dinv[cols]

    # sort by row for indices_are_sorted segment ops
    order = np.argsort(rows, kind="stable")
    rows, cols, norm_vals = rows[order], cols[order], norm_vals[order]

    # +1 guarantees at least one zero padding edge: the CSR gather's
    # over-degree slots and tail padding point at e_pad-1
    e_pad = _round_up(n_real + 1, pad_multiple or _edge_pad_multiple())
    row_p = np.zeros(e_pad, dtype=np.int32)
    col_p = np.zeros(e_pad, dtype=np.int32)
    w_p = np.zeros(e_pad, dtype=np.float32)
    msk = np.zeros(e_pad, dtype=bool)
    row_p[:n_real] = rows
    col_p[:n_real] = cols
    w_p[:n_real] = norm_vals
    msk[:n_real] = True
    # padding rows point at the last node to keep the sorted invariant
    row_p[n_real:] = n_nodes - 1

    # invariant: every node appears as a row (self-loops guarantee it)
    assert np.unique(rows).size == n_nodes, \
        "graph rows must cover every node (self-loops missing?)"

    # CSR gather structures over rows (out-edges) and cols (in-edges);
    # hub tails go through the (small) scatter path.  The col CSR operates
    # in col-sorted order via the col_order permutation; padded edges keep
    # col = n_nodes-1 so they sort last and carry zero cotangents.
    col_p[n_real:] = n_nodes - 1
    starts, deg, tail_sel, tail_row, gather_width, n_tail = _csr_structure(
        rows, n_nodes, e_pad)

    col_order = np.argsort(col_p, kind="stable").astype(np.int32)
    cols_sorted = col_p[col_order]
    (col_starts, col_deg, col_tail_sel, col_tail_row, col_gather_width,
     _nt) = _csr_structure(cols_sorted.astype(np.int64), n_nodes, e_pad)

    # row/col tile structures for the Pallas aggregation kernel
    from snag_tpu.ops.pallas.tile_segment import build_tile_structure
    rt = build_tile_structure(row_p.astype(np.int64), starts, n_nodes, e_pad)
    cstarts_full = np.zeros(n_nodes, dtype=np.int64)
    cdeg = np.bincount(cols_sorted.astype(np.int64), minlength=n_nodes)
    cstarts_full[1:] = np.cumsum(cdeg)[:-1]
    ct = build_tile_structure(cols_sorted.astype(np.int64), cstarts_full,
                              n_nodes, e_pad)

    return Graph(n_nodes=n_nodes, n_edges=n_real, row=row_p, col=col_p,
                 w=w_p, mask=msk, starts=starts, deg=deg, tail_sel=tail_sel,
                 tail_row=tail_row, gather_width=gather_width, n_tail=n_tail,
                 col_order=col_order, col_sorted=cols_sorted.astype(np.int32),
                 row_cs=row_p[col_order].astype(np.int32),
                 inv_col_order=np.argsort(col_order).astype(np.int32),
                 mask_cs=msk[col_order],
                 col_starts=col_starts, col_deg=col_deg,
                 col_tail_sel=col_tail_sel, col_tail_row=col_tail_row,
                 col_gather_width=col_gather_width,
                 rt_chunk_base=rt.chunk_base, rt_nc=rt.nc,
                 rt_spill_sel=rt.spill_sel, rt_spill_row=rt.spill_row,
                 rt_n_tiles=rt.n_tiles, rt_max_chunks=rt.max_chunks,
                 rt_n_spill=rt.n_spill,
                 ct_chunk_base=ct.chunk_base, ct_nc=ct.nc,
                 ct_spill_sel=ct.spill_sel, ct_spill_row=ct.spill_row,
                 ct_n_tiles=ct.n_tiles, ct_max_chunks=ct.max_chunks,
                 ct_n_spill=ct.n_spill,
                 rt_flat_tile=rt.flat_tile, rt_flat_chunk=rt.flat_chunk,
                 rt_flat_first=rt.flat_first, rt_n_flat=rt.n_flat,
                 ct_flat_tile=ct.flat_tile, ct_flat_chunk=ct.flat_chunk,
                 ct_flat_first=ct.flat_first, ct_n_flat=ct.n_flat)


def dense_adjacency(g: Graph) -> np.ndarray:
    """Densify for tests / tiny graphs."""
    a = np.zeros((g.n_nodes, g.n_nodes), dtype=np.float64)
    np.add.at(a, (g.row[g.mask], g.col[g.mask]), g.w[g.mask])
    return a
