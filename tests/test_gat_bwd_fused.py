"""Fused GAT backward kernel (ops/pallas/gat_bwd.py) vs the XLA fallback.

Interpret mode on CPU; the compiled path is A/B'd on TPU by
scripts/check_gat_bwd_tpu.py.
"""

import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import pytest

import snag_tpu.ops.gat_attn_primitive as gp
import snag_tpu.ops.pallas.tile_segment as tsg
from snag_tpu.data.graph import build_graph
from snag_tpu.ops.gat_attn_primitive import gat_attention


def _setup(n=300, n_tri=900, c=48, h=2, seed=0):
    rng = np.random.default_rng(seed)
    tri = [(int(rng.integers(n)), 0, int(rng.integers(n)))
           for _ in range(n_tri)]
    g = build_graph(n, tri)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    return g, x, s_src, s_dst, wa, wr


def _grads(g, x, s_src, s_dst, wa, wr):
    def loss(x, s_src, s_dst):
        agg, rs = gat_attention(x, s_src, s_dst, g)
        return (agg * wa).sum() + (rs * wr).sum()
    return jax.grad(loss, argnums=(0, 1, 2))(x, s_src, s_dst)


@pytest.mark.parametrize("flat", [False, True])
def test_fused_bwd_matches_fallback(flat):
    g, x, s_src, s_dst, wa, wr = _setup()

    want = _grads(g, x, s_src, s_dst, wa, wr)   # CPU -> XLA fallback

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp), \
            mock.patch.object(gp, "pallas_available", lambda: True), \
            mock.patch.object(tsg, "FLAT_GRID", flat):
        import snag_tpu.ops.pallas.gat_attention as ga
        with mock.patch.object(ga, "pallas_available", lambda: True):
            got = _grads(g, x, s_src, s_dst, wa, wr)

    for name, a, b in zip(("d_x", "d_s_src", "d_s_dst"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("flat", [False, True])
def test_fused_bwd_with_spill_and_hubs(flat):
    """A hub-heavy graph forces rt/ct-spill edges through the XLA tails
    (tiled grid) or through extra in-kernel work items (flat grid)."""
    rng = np.random.default_rng(3)
    n = 260
    tri = [(int(rng.integers(n)), 0, 7) for _ in range(400)]        # hub col
    tri += [(5, 0, int(rng.integers(n))) for _ in range(400)]       # hub row
    tri += [(int(rng.integers(n)), 0, int(rng.integers(n)))
            for _ in range(300)]
    g = build_graph(n, tri)
    c, h = 24, 2
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    want = _grads(g, x, s_src, s_dst, wa, wr)

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp), \
            mock.patch.object(gp, "pallas_available", lambda: True), \
            mock.patch.object(tsg, "FLAT_GRID", flat):
        import snag_tpu.ops.pallas.gat_attention as ga
        with mock.patch.object(ga, "pallas_available", lambda: True):
            got = _grads(g, x, s_src, s_dst, wa, wr)

    for name, a, b in zip(("d_x", "d_s_src", "d_s_dst"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_row_tile_chunks_cover_all_nonspill_edges():
    """Invariants the packed-output block scheme relies on: every real
    edge is either inside its owning row-tile's chunk range or an rt-spill
    position, tiles are never empty, and chunk bases only move forward
    (so boundary-block visits are consecutive grid cells)."""
    from snag_tpu.ops.pallas.tile_segment import CHUNK, R
    g, *_ = _setup(seed=9)
    cb = np.asarray(g.rt_chunk_base, np.int64)
    nc = np.asarray(g.rt_nc, np.int64)
    spill = set(np.asarray(g.rt_spill_sel[:g.rt_n_spill]).tolist())
    row = np.asarray(g.row)
    mask = np.asarray(g.mask)
    assert (nc >= 1).all()
    assert (cb[1:] >= cb[:-1] + nc[:-1] - 1).all()
    for p in np.nonzero(mask)[0]:
        t = row[p] // R
        lo, hi = cb[t] * CHUNK, (cb[t] + nc[t]) * CHUNK
        assert (lo <= p < hi) or p in spill

def test_flat_work_list_invariants():
    """Flat-grid invariants (tile_segment.build_tile_structure): every real
    edge's (tile, chunk) pair appears in the flat list, each tile's items
    are one consecutive run whose first item is flagged, and every tile
    appears at least once (so its output block is written)."""
    from snag_tpu.ops.pallas.tile_segment import CHUNK, R
    for seed, hub in ((9, False), (3, True)):
        rng = np.random.default_rng(seed)
        n = 260
        tri = [(int(rng.integers(n)), 0, int(rng.integers(n)))
               for _ in range(700)]
        if hub:
            tri += [(5, 0, int(rng.integers(n))) for _ in range(400)]
        g = build_graph(n, tri)
        ft = np.asarray(g.rt_flat_tile)
        fc = np.asarray(g.rt_flat_chunk)
        ff = np.asarray(g.rt_flat_first)
        assert g.rt_n_flat == len(ft) == len(fc) == len(ff)
        # tiles ascend; first item of each tile (and only it) is flagged
        assert (np.diff(ft) >= 0).all()
        starts = np.r_[0, np.nonzero(np.diff(ft))[0] + 1]
        want_ff = np.zeros_like(ff)
        want_ff[starts] = 1
        np.testing.assert_array_equal(ff, want_ff)
        assert set(ft.tolist()) == set(range(g.rt_n_tiles))
        pairs = set(zip(ft.tolist(), fc.tolist()))
        row = np.asarray(g.row)
        mask = np.asarray(g.mask)
        for p in np.nonzero(mask)[0]:
            assert (row[p] // R, p // CHUNK) in pairs
