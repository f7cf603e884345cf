"""Tile-structure + weighted-segment-kernel correctness.

The Pallas kernel itself runs in interpreter mode here (CPU); the TPU
compiled path is exercised by bench.py / scripts/profile_gat_kernel.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snag_tpu.data.graph import build_graph
from snag_tpu.ops.pallas import tile_segment as tsg


def _graph(n=300, n_tri=900, seed=0):
    rng = np.random.default_rng(seed)
    tri = [(int(rng.integers(n)), 0, int(rng.integers(n))) for _ in range(n_tri)]
    return build_graph(n, tri)


def test_tile_structure_covers_all_edges():
    g = _graph()
    ts = tsg.TileStructure(
        chunk_base=g.rt_chunk_base, nc=g.rt_nc, spill_sel=g.rt_spill_sel,
        spill_row=g.rt_spill_row, n_tiles=g.rt_n_tiles,
        max_chunks=g.rt_max_chunks, n_spill=g.rt_n_spill)
    # every real edge position is inside its tile's chunk window or spilled
    covered = np.zeros(g.e_pad, dtype=bool)
    for t in range(ts.n_tiles):
        lo = int(ts.chunk_base[t]) * tsg.CHUNK
        hi = lo + int(ts.nc[t]) * tsg.CHUNK
        rows_in_tile = (g.row >= t * tsg.R) & (g.row < (t + 1) * tsg.R)
        pos = np.arange(g.e_pad)
        covered |= rows_in_tile & (pos >= lo) & (pos < hi)
    covered[np.asarray(ts.spill_sel[:ts.n_spill])] = True
    assert covered[g.mask].all()


@pytest.mark.parametrize("flat", [False, True])
def test_weighted_segment_kernel_interpret_matches_xla(flat):
    g = _graph(n=200, n_tri=700, seed=3)
    rng = np.random.default_rng(7)
    e_pad = g.e_pad
    c, h = 48, 2
    x = rng.normal(size=(g.n_nodes, c)).astype(np.float32)
    xc = jnp.asarray(x)[jnp.asarray(g.col)]
    e = rng.uniform(0.1, 2.0, size=(e_pad, h)).astype(np.float32)
    e = jnp.where(jnp.asarray(g.mask)[:, None], jnp.asarray(e), 0.0)

    want_agg, want_rs = tsg.xla_weighted_segment_sum(
        xc, e, jnp.asarray(g.row), g.n_nodes)

    ts = tsg.TileStructure(
        chunk_base=g.rt_chunk_base, nc=g.rt_nc, spill_sel=g.rt_spill_sel,
        spill_row=g.rt_spill_row, n_tiles=g.rt_n_tiles,
        max_chunks=g.rt_max_chunks, n_spill=g.rt_n_spill,
        flat_tile=g.rt_flat_tile, flat_chunk=g.rt_flat_chunk,
        flat_first=g.rt_flat_first, n_flat=g.rt_n_flat)

    import unittest.mock as mock
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp), \
            mock.patch.object(tsg, "FLAT_GRID", flat):
        got_agg, got_rs = tsg.tile_weighted_segment_sum(
            xc, e, jnp.asarray(g.row), ts, g.n_nodes)

    np.testing.assert_allclose(np.asarray(got_agg), np.asarray(want_agg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rs), np.asarray(want_rs),
                               rtol=1e-5, atol=1e-5)


def test_gat_aggregate_grad_matches_autodiff_fallback():
    """custom-VJP backward vs autodiff of the plain formulation."""
    g = _graph(n=120, n_tri=300, seed=5)
    rng = np.random.default_rng(11)
    c, h = 16, 2
    x = jnp.asarray(rng.normal(size=(g.n_nodes, c)).astype(np.float32))
    e = jnp.where(jnp.asarray(g.mask)[:, None],
                  jnp.asarray(rng.uniform(0.5, 1.5,
                                          size=(g.e_pad, h)).astype(np.float32)),
                  0.0)

    from snag_tpu.ops.gat_agg import gat_aggregate

    def f_custom(x, e):
        agg, rs = gat_aggregate(x, e, g)
        return (agg ** 2).sum() + (rs ** 2).sum()

    def f_plain(x, e):
        xc = x[jnp.asarray(g.col)]
        agg, rs = tsg.xla_weighted_segment_sum(xc, e, jnp.asarray(g.row),
                                               g.n_nodes)
        return (agg ** 2).sum() + (rs ** 2).sum()

    gx1, ge1 = jax.grad(f_custom, argnums=(0, 1))(x, e)
    gx2, ge2 = jax.grad(f_plain, argnums=(0, 1))(x, e)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    # padded edges carry zero cotangent in the custom path by construction
    me = np.asarray(jnp.asarray(g.mask))
    np.testing.assert_allclose(np.asarray(ge1)[me], np.asarray(ge2)[me],
                               rtol=1e-4, atol=1e-4)


def test_gat_attention_primitive_matches_autodiff():
    """Fused attention primitive (fwd + custom bwd) vs plain formulation."""
    g = _graph(n=150, n_tri=450, seed=9)
    rng = np.random.default_rng(13)
    c, h = 24, 2
    x = jnp.asarray(rng.normal(size=(g.n_nodes, c)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(g.n_nodes, h)).astype(np.float32)) * 0.3
    s_dst = jnp.asarray(rng.normal(size=(g.n_nodes, h)).astype(np.float32)) * 0.3

    from snag_tpu.ops.gat_attn_primitive import gat_attention
    from snag_tpu.ops.pallas.gat_attention import _leaky

    def f_custom(x, a, b):
        agg, rs = gat_attention(x, a, b, g)
        return (agg ** 2).sum() + (rs ** 2).sum()

    def f_plain(x, a, b):
        row = jnp.asarray(g.row)
        col = jnp.asarray(g.col)
        mask = jnp.asarray(g.mask)
        score = a[row] + b[col]
        e = jnp.where(mask[:, None], jnp.exp(-_leaky(score)), 0.0)
        xc = x[col]
        vals = (e[:, :, None] * xc[:, None, :]).reshape(g.e_pad, -1)
        agg = jax.ops.segment_sum(vals, row, num_segments=g.n_nodes,
                                  indices_are_sorted=True)
        rs = jax.ops.segment_sum(e, row, num_segments=g.n_nodes,
                                 indices_are_sorted=True)
        return (agg ** 2).sum() + (rs ** 2).sum()

    v1 = f_custom(x, s_src, s_dst)
    v2 = f_plain(x, s_src, s_dst)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, s_src, s_dst)
    g2 = jax.grad(f_plain, argnums=(0, 1, 2))(x, s_src, s_dst)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
