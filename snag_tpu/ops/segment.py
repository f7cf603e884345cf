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


def segment_normalize(row: jnp.ndarray, val: jnp.ndarray, n_rows: int,
                      eps: float = 0.0) -> jnp.ndarray:
    """Per-row sums of edge values broadcast back onto edges.

    Returns rowsum[row] so callers can divide edge contributions; used by the
    GAT attention normalisation (layers.py:81, 86).
    """
    rowsum = jax.ops.segment_sum(val, row, num_segments=n_rows,
                                 indices_are_sorted=True)
    return rowsum + eps
