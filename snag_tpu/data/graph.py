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

EDGE_PAD_MULTIPLE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Graph:
    """Padded edge-list adjacency.

    ``out[i] = sum over edges e with row[e]==i of w[e] * h[col[e]]`` —
    computed as ``segment_sum(w * h[col], row, N)``.  Edges are sorted by
    ``row``; entries past ``n_edges`` are padding with ``w == 0`` and
    ``mask == False`` (they point at node 0 and contribute nothing).
    """

    n_nodes: int
    n_edges: int          # real (unpadded) edge count, self-loops included
    row: np.ndarray       # (E_pad,) int32, sorted ascending
    col: np.ndarray       # (E_pad,) int32
    w: np.ndarray         # (E_pad,) float32 — sym-normalized; 0 on padding
    mask: np.ndarray      # (E_pad,) bool

    @property
    def e_pad(self) -> int:
        return int(self.row.shape[0])


# Graph is a pytree: edge arrays are leaves (jit arguments, not baked-in
# constants), node/edge counts are static aux data.
jax.tree_util.register_pytree_node(
    Graph,
    lambda g: ((g.row, g.col, g.w, g.mask), (g.n_nodes, g.n_edges)),
    lambda aux, leaves: Graph(n_nodes=aux[0], n_edges=aux[1], row=leaves[0],
                              col=leaves[1], w=leaves[2], mask=leaves[3]),
)


def build_graph(n_nodes: int, triples: Sequence[Tuple[int, int, int]],
                pad_multiple: int = EDGE_PAD_MULTIPLE) -> Graph:
    """Build the normalized, padded, row-sorted edge list from raw triples."""
    # multiplicity-weighted undirected pairs, h != t  (get_adjr)
    pairs = {}
    for h, _, t in triples:
        if h == t:
            continue
        key = (int(h), int(t))
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

    e_pad = _round_up(max(n_real, 1), pad_multiple)
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

    return Graph(n_nodes=n_nodes, n_edges=n_real, row=row_p, col=col_p,
                 w=w_p, mask=msk)


def dense_adjacency(g: Graph) -> np.ndarray:
    """Densify for tests / tiny graphs."""
    a = np.zeros((g.n_nodes, g.n_nodes), dtype=np.float64)
    np.add.at(a, (g.row[g.mask], g.col[g.mask]), g.w[g.mask])
    return a
