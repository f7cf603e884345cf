import numpy as np
import jax.numpy as jnp

from snag_tpu.eval.ranking import csls_sim, full_rank_eval, pairwise_distances


def test_pairwise_distances():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    y = rng.normal(size=(12, 4)).astype(np.float32)
    got = np.asarray(pairwise_distances(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_csls_matches_naive():
    rng = np.random.default_rng(1)
    sim = rng.normal(size=(9, 11)).astype(np.float32)
    k = 3
    got = np.asarray(csls_sim(jnp.asarray(sim), k))
    near1 = np.sort(sim, axis=1)[:, -k:].mean(axis=1)   # row top-k means
    near2 = np.sort(sim.T, axis=1)[:, -k:].mean(axis=1)
    want = 2 * sim - near1[:, None] - near2[None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rank_extraction_matches_sort():
    rng = np.random.default_rng(2)
    n = 30
    emb_l = rng.normal(size=(n, 8)).astype(np.float32)
    emb_r = emb_l + 0.1 * rng.normal(size=(n, 8)).astype(np.float32)
    res = full_rank_eval(jnp.asarray(emb_l), jnp.asarray(emb_r),
                         top_k=(1, 10), with_top3=True)

    d = ((emb_l[:, None, :] - emb_r[None, :, :]) ** 2).sum(-1)
    ranks = []
    for i in range(n):
        order = np.argsort(d[i], kind="stable")
        ranks.append(int(np.where(order == i)[0][0]))
    ranks = np.array(ranks)
    np.testing.assert_array_equal(res.ranks_l2r, ranks)
    assert abs(res.mrr_l2r - (1.0 / (ranks + 1)).mean()) < 1e-6
    assert res.acc_l2r[0] == round((ranks < 1).mean(), 4)
    # top3 consistent with distances
    np.testing.assert_array_equal(res.top3_l2r[:, 0], d.argmin(axis=1))
