"""sorted_block_segment_sum vs plain segment_sum."""

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.data.graph import build_graph
from snag_tpu.ops.segment import sorted_block_segment_sum


def _case(n, n_edges, block, seed=0):
    rng = np.random.default_rng(seed)
    triples = [(int(rng.integers(0, n)), 0, int(rng.integers(0, n)))
               for _ in range(n_edges)]
    g = build_graph(n, triples, pad_multiple=64)
    vals = rng.normal(size=(g.e_pad, 7)).astype(np.float32)
    vals[~g.mask] = 0.0
    want = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(g.row),
                               num_segments=n, indices_are_sorted=True)
    got = sorted_block_segment_sum(jnp.asarray(vals), jnp.asarray(g.row), n,
                                   block=block, matmul_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_smaller_than_edges():
    _case(50, 300, block=64)


def test_block_larger_than_edges():
    _case(20, 40, block=1024)


def test_non_divisible_padding():
    _case(30, 100, block=48, seed=3)


def test_gradients_match():
    rng = np.random.default_rng(1)
    n = 40
    triples = [(int(rng.integers(0, n)), 0, int(rng.integers(0, n)))
               for _ in range(150)]
    g = build_graph(n, triples, pad_multiple=64)
    vals = jnp.asarray(rng.normal(size=(g.e_pad, 5)).astype(np.float32))
    row = jnp.asarray(g.row)

    def f_block(v):
        return (sorted_block_segment_sum(v, row, n, block=64,
                                         matmul_dtype=jnp.float32) ** 2).sum()

    def f_ref(v):
        return (jax.ops.segment_sum(v, row, num_segments=n,
                                    indices_are_sorted=True) ** 2).sum()

    g1 = jax.grad(f_block)(vals)
    g2 = jax.grad(f_ref)(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
