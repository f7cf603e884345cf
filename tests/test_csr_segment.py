"""CSR scatter-free segment ops: forward and gradients must match the plain
scatter formulations exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.data.graph import build_graph
from snag_tpu.ops.segment import (edge_gather_col, edge_gather_row,
                                  segment_reduce_sorted)


def _graph(n=40, n_edges=200, seed=0, hub=True):
    rng = np.random.default_rng(seed)
    triples = [(int(rng.integers(0, n)), 0, int(rng.integers(0, n)))
               for _ in range(n_edges)]
    if hub:  # force a hub past gather_width to exercise the tail path
        triples += [(0, 0, int(t)) for t in rng.integers(1, n, size=150)]
    return build_graph(n, triples, pad_multiple=64)


def test_segment_reduce_matches_segment_sum():
    g = _graph()
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(g.e_pad, 6)).astype(np.float32)
    vals[~g.mask] = 0.0
    want = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(g.row),
                               num_segments=g.n_nodes, indices_are_sorted=True)
    got = segment_reduce_sorted(jnp.asarray(vals), g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_segment_reduce_grad():
    g = _graph(seed=2)
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(g.e_pad, 4)).astype(np.float32)
    vals[~g.mask] = 0.0
    vals = jnp.asarray(vals)
    coef = jnp.asarray(rng.normal(size=(g.n_nodes, 4)).astype(np.float32))

    def f_csr(v):
        return (segment_reduce_sorted(v, g) * coef).sum()

    def f_ref(v):
        return (jax.ops.segment_sum(v, jnp.asarray(g.row),
                                    num_segments=g.n_nodes,
                                    indices_are_sorted=True) * coef).sum()

    g1 = np.asarray(jax.grad(f_csr)(vals))
    g2 = np.asarray(jax.grad(f_ref)(vals))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_edge_gather_grads():
    """Backward of node->edge gathers must equal the scatter-add VJP when
    padded-edge cotangents are zero (as in all real uses)."""
    g = _graph(seed=4)
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 5)).astype(np.float32))
    w_edge = rng.normal(size=(g.e_pad, 5)).astype(np.float32)
    w_edge[~g.mask] = 0.0   # zero weight on padding => zero cotangent
    w_edge = jnp.asarray(w_edge)

    for gather, idx in ((edge_gather_col, g.col), (edge_gather_row, g.row)):
        def f_csr(h):
            return (gather(h, g) * w_edge).sum()

        def f_ref(h):
            return (h[jnp.asarray(idx)] * w_edge).sum()

        g1 = np.asarray(jax.grad(f_csr)(h))
        g2 = np.asarray(jax.grad(f_ref)(h))
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)
