import jax.numpy as jnp
import numpy as np

import snag_tpu.eval.ranking as R


def test_chunked_matches_full(monkeypatch):
    rng = np.random.default_rng(0)
    n = 150
    l = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    r = l + 0.2 * jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    full = R.full_rank_eval(l, r, use_csls=True, csls_k=3)
    monkeypatch.setattr(R, "FULL_MATRIX_MAX", 10)
    chunked = R.full_rank_eval(l, r, use_csls=True, csls_k=3)

    # different matmul tilings round differently; near-ties may flip by 1
    diff = np.abs(full.ranks_l2r.astype(int) - chunked.ranks_l2r.astype(int))
    assert (diff == 0).mean() > 0.98 and diff.max() <= 1
    assert abs(full.mrr_r2l - chunked.mrr_r2l) < 1e-2
    assert abs(full.mrr_l2r - chunked.mrr_l2r) < 1e-2


def test_knn_means_chunked_matches_single_block():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(300, 12)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(220, 12)).astype(np.float32))
    whole = R._knn_means_chunk(q, c, 3)
    chunked = R._knn_means(q, c, 3, chunk=64)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_chunked_csls_beyond_full_matrix_max():
    """>FULL_MATRIX_MAX pairs with CSLS must run without materializing the
    full (N, N) similarity matrix (VERDICT r1 item 4: the 100K-geometry CSLS
    eval has to fit HBM; transients are now O(chunk * N))."""
    rng = np.random.default_rng(3)
    n = R.FULL_MATRIX_MAX + 600
    l = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    r = l + 0.05 * jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    res = R.full_rank_eval(l, r, use_csls=True, csls_k=3)
    assert res.mrr_l2r > 0.5 and res.mrr_r2l > 0.5
    assert res.ranks_l2r.shape == (n,)


def test_chunked_no_csls(monkeypatch):
    rng = np.random.default_rng(1)
    n = 90
    l = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    r = l + 0.1 * jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    full = R.full_rank_eval(l, r)
    monkeypatch.setattr(R, "FULL_MATRIX_MAX", 7)
    chunked = R.full_rank_eval(l, r)
    np.testing.assert_array_equal(full.ranks_l2r, chunked.ranks_l2r)
