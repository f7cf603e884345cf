"""Sparse-matrix primitives as sorted-edge-list segment ops.

The reference's only hand-written kernel is a sparse COO x dense matmul with
a sparse-only backward (SNAG_MMEA/model/layers.py:9-33 ``SpecialSpmm``).  On
TPU the same contraction is a gather + ``segment_sum`` over a row-sorted edge
list; XLA fuses the gather/multiply/scatter chain and the autodiff of
``segment_sum`` is exactly the sparse-only backward the reference hand-rolls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spmm(row: jnp.ndarray, col: jnp.ndarray, val: jnp.ndarray,
         n_rows: int, dense: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum over edges e with row[e]==i of val[e] * dense[col[e]].

    ``row`` must be sorted ascending (build_graph guarantees this); padded
    edges must carry ``val == 0``.

    dense: (N, F) or (N,) -> out: (n_rows, F) or (n_rows,)
    """
    gathered = dense[col]
    if gathered.ndim > val.ndim:
        val = val.reshape(val.shape + (1,) * (gathered.ndim - val.ndim))
    return jax.ops.segment_sum(val * gathered, row, num_segments=n_rows,
                               indices_are_sorted=True)


import functools

import numpy as np


def _csr_gather_fwd_impl(values, arrs, n_nodes, gather_width):
    starts, deg, tail_sel, tail_row, _row = arrs
    d = int(gather_width)
    e = values.shape[0]
    pos = jnp.arange(d, dtype=jnp.int32)
    idx = starts[:, None] + pos[None, :]
    # over-degree slots point at the last (guaranteed-padding, zero) edge
    idx = jnp.where(pos[None, :] >= deg[:, None], e - 1, idx)
    # low-precision values (bf16 edge transport halves the gather bytes, the
    # profiled bandwidth bound) still accumulate in f32
    acc = jnp.float32 if values.dtype != jnp.float64 else values.dtype
    out = jnp.take(values, idx, axis=0).sum(axis=1, dtype=acc)   # (N, C)
    tail = jax.ops.segment_sum(values[tail_sel].astype(acc), tail_row,
                               num_segments=n_nodes, indices_are_sorted=True)
    return (out + tail).astype(values.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _csr_gather_core(values, arrs, n_nodes, gather_width):
    return _csr_gather_fwd_impl(values, arrs, n_nodes, gather_width)


def _csr_fwd(values, arrs, n_nodes, gather_width):
    out = _csr_gather_fwd_impl(values, arrs, n_nodes, gather_width)
    row = arrs[4]
    shapes = tuple(a.shape for a in arrs)
    return out, (row, shapes)


def _csr_bwd(n_nodes, gather_width, res, g):
    row, shapes = res
    # the exact VJP of a segment-sum: broadcast the row cotangent back onto
    # its edges — one gather, no scatter
    zeros = tuple(np.zeros(s, dtype=jax.dtypes.float0) for s in shapes)
    return (g[row], zeros)


_csr_gather_core.defvjp(_csr_fwd, _csr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _edge_gather(node_vals, idx, arrs, n_nodes, gather_width):
    return node_vals[idx]


def _eg_fwd(node_vals, idx, arrs, n_nodes, gather_width):
    return node_vals[idx], (arrs, tuple(idx.shape))


def _eg_bwd(n_nodes, gather_width, res, g):
    arrs, idx_shape = res
    # VJP of a node->edge gather is a segment-sum over the index — computed
    # scatter-free via the CSR structure.  ``arrs`` may carry a permutation
    # (col-sorted order) as its last element.
    csr_arrs, order = arrs
    if order is not None:
        g = g[order]
    grad_nodes = _csr_gather_core(g, csr_arrs, n_nodes, gather_width)
    zeros_idx = np.zeros(idx_shape, dtype=jax.dtypes.float0)
    zeros_arrs = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0), arrs)
    return (grad_nodes, zeros_idx, zeros_arrs)


_edge_gather.defvjp(_eg_fwd, _eg_bwd)


def edge_gather_row(node_vals: jnp.ndarray, graph) -> jnp.ndarray:
    """node_vals[graph.row] with a scatter-free backward (row CSR)."""
    if graph.starts is None:
        return node_vals[graph.row]
    csr = (graph.starts, graph.deg, graph.tail_sel, graph.tail_row, graph.row)
    return _edge_gather(node_vals, graph.row, (csr, None), graph.n_nodes,
                        graph.gather_width)


def edge_gather_col(node_vals: jnp.ndarray, graph) -> jnp.ndarray:
    """node_vals[graph.col] with a scatter-free backward (col CSR over the
    col-sorted edge order)."""
    if graph.col_starts is None:
        return node_vals[graph.col]
    csr = (graph.col_starts, graph.col_deg, graph.col_tail_sel,
           graph.col_tail_row, graph.col)
    return _edge_gather(node_vals, graph.col, (csr, graph.col_order),
                        graph.n_nodes, graph.col_gather_width)


def segment_reduce_sorted(values: jnp.ndarray, graph) -> jnp.ndarray:
    """Scatter-free segment-sum over the graph's sorted edges.

    TPU scatters serialize per update (~8M updates/s — the profiled
    bottleneck of the training step).  This path reduces the head of every
    adjacency row (up to graph.gather_width edges, >=97% of all edges) with
    a dense gather+sum that runs at HBM bandwidth, and only the hub tails
    through a small segment_sum.  Backward is a single gather (custom_vjp).

    ``values`` must be zero on padded edge positions.
    """
    if graph.starts is None:
        return jax.ops.segment_sum(values, graph.row,
                                   num_segments=graph.n_nodes,
                                   indices_are_sorted=True)
    arrs = (graph.starts, graph.deg, graph.tail_sel, graph.tail_row, graph.row)
    return _csr_gather_core(values, arrs, graph.n_nodes, graph.gather_width)


def sorted_block_segment_sum(values: jnp.ndarray, row: jnp.ndarray,
                             n_rows: int, block: int = 1024,
                             matmul_dtype=jnp.bfloat16,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Scatter-free segment-sum for row-sorted edges.

    TPU scatters serialize per update, which made both the segment_sum and
    the dense-adjacency formulations the dominant step cost at DBP15K scale
    (profiled: ~100 ms/step).  This path has NO data-dependent writes:

    * edges are processed in blocks of ``block``; because every node owns a
      self-loop, the row ids inside a sorted block span < ``block`` distinct
      consecutive values, so ``row - row[block_start]`` is a valid local
      index;
    * each block reduces to a (block, C) partial via a one-hot matmul on the
      MXU;
    * a ``lax.scan`` accumulates partials into a sliding output window via
      dynamic_slice + add + dynamic_update_slice (offsets are data-dependent
      *reads/writes of contiguous windows*, which are fast, unlike
      scatters).

    The backward pass is automatically scatter-free too (transposed one-hot
    matmuls + window gathers).

    values: (E, C) with zeros on padded edges; row: (E,) sorted ascending.
    """
    e, c = values.shape
    if e < block:
        block = e
    if e % block != 0:
        pad = (-e) % block
        values = jnp.pad(values, ((0, pad), (0, 0)))
        row = jnp.pad(row, (0, pad), mode="edge")   # keeps sorted invariant
        e = e + pad
    n_blk = e // block

    vals = values.reshape(n_blk, block, c).astype(matmul_dtype)
    rows = row.reshape(n_blk, block)
    base = rows[:, 0]
    local = (rows - base[:, None]).astype(jnp.int32)   # in [0, block)

    out0 = jnp.zeros((n_rows + block, c), out_dtype)

    def body(out, inp):
        v, loc, b0 = inp
        oh = jax.nn.one_hot(loc, block, dtype=matmul_dtype)       # (blk, blk)
        part = jnp.dot(oh.T, v, preferred_element_type=jnp.float32)
        win = jax.lax.dynamic_slice(out, (b0, 0), (block, c))
        out = jax.lax.dynamic_update_slice(out, win + part.astype(out_dtype),
                                           (b0, 0))
        return out, None

    out, _ = jax.lax.scan(body, out0, (vals, local, base))
    return out[:n_rows]


def scatter_dense_adj(row: jnp.ndarray, col: jnp.ndarray, val: jnp.ndarray,
                      n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the sparse matrix densely: A[row[e], col[e]] += val[e].

    The MXU fast path for medium graphs: scattering E *scalars* is ~F times
    cheaper than segment-summing E rows of width F, and the subsequent
    (N, N) @ (N, F) matmul runs at MXU speed.  Profiling at DBP15K scale
    showed the row-scatter formulation costs ~100 ms/step; this path
    replaces it with a sub-ms scalar scatter + a few-ms matmul.
    """
    a = jnp.zeros((n, n), dtype=dtype)
    return a.at[row, col].add(val.astype(dtype))


def spmm_via_dense(row: jnp.ndarray, col: jnp.ndarray, val: jnp.ndarray,
                   n: int, dense: jnp.ndarray,
                   adj_dtype=jnp.bfloat16) -> jnp.ndarray:
    """spmm computed as scatter-to-dense + matmul (see scatter_dense_adj)."""
    a = scatter_dense_adj(row, col, val, n, adj_dtype)
    return jnp.dot(a, dense.astype(adj_dtype),
                   preferred_element_type=jnp.float32)


# Above this node count the dense (N, N) bf16 adjacency exceeds a sensible
# HBM budget (32768^2 * 2B = 2.1 GB transient) and the segment path is used.
DENSE_SPMM_MAX_NODES = 32768


def segment_normalize(row: jnp.ndarray, val: jnp.ndarray, n_rows: int,
                      eps: float = 0.0) -> jnp.ndarray:
    """Per-row sums of edge values broadcast back onto edges.

    Returns rowsum[row] so callers can divide edge contributions; used by the
    GAT attention normalisation (layers.py:81, 86).
    """
    rowsum = jax.ops.segment_sum(val, row, num_segments=n_rows,
                                 indices_are_sorted=True)
    return rowsum + eps
