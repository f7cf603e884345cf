import numpy as np
import jax.numpy as jnp

from snag_tpu.data.graph import build_graph, dense_adjacency
from snag_tpu.ops.segment import spmm


def naive_normalized_adj(n, triples):
    """Independent reimplementation of the reference semantics:
    undirected multiplicity adjacency + self loops, D^-1/2 A D^-1/2."""
    a = np.zeros((n, n))
    for h, _, t in triples:
        if h == t:
            continue
        a[h, t] += 1
        a[t, h] += 1
    a += np.eye(n)
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    return a * dinv[:, None] * dinv[None, :]


def test_build_graph_matches_naive():
    rng = np.random.default_rng(0)
    n = 17
    triples = [(int(rng.integers(0, n)), int(rng.integers(0, 5)),
                int(rng.integers(0, n))) for _ in range(60)]
    g = build_graph(n, triples, pad_multiple=8)
    got = dense_adjacency(g)
    want = naive_normalized_adj(n, triples)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # rows sorted for segment ops
    assert (np.diff(g.row) >= 0).all()


def test_spmm_matches_dense():
    rng = np.random.default_rng(1)
    n = 13
    triples = [(int(rng.integers(0, n)), 0, int(rng.integers(0, n)))
               for _ in range(40)]
    g = build_graph(n, triples, pad_multiple=8)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    out = spmm(jnp.asarray(g.row), jnp.asarray(g.col), jnp.asarray(g.w), n,
               jnp.asarray(x))
    want = dense_adjacency(g) @ x
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_default_pad_multiple_tracks_kernel_chunk(monkeypatch):
    """Edge arrays must land on a multiple of the Pallas CHUNK: the GAT
    kernels' block specs slice edges in CHUNK units, so a SNAG_GAT_CHUNK
    override that does not divide 1024 (e.g. 768) needs lcm padding."""
    import snag_tpu.ops.pallas.tile_segment as ts
    from snag_tpu.data.graph import _edge_pad_multiple

    monkeypatch.setattr(ts, "CHUNK", 512)
    assert _edge_pad_multiple() == 1024
    monkeypatch.setattr(ts, "CHUNK", 768)
    assert _edge_pad_multiple() == 3072

    monkeypatch.setattr(ts, "CHUNK", 768)
    triples = [(i, 0, (i + 1) % 9) for i in range(9)]
    g = build_graph(9, triples)
    assert g.row.shape[0] % 768 == 0 and g.row.shape[0] % 1024 == 0
