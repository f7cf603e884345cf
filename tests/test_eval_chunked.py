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


def test_chunked_no_csls(monkeypatch):
    rng = np.random.default_rng(1)
    n = 90
    l = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    r = l + 0.1 * jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    full = R.full_rank_eval(l, r)
    monkeypatch.setattr(R, "FULL_MATRIX_MAX", 7)
    chunked = R.full_rank_eval(l, r)
    np.testing.assert_array_equal(full.ranks_l2r, chunked.ranks_l2r)
