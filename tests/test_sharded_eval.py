"""Sharded full-rank eval == single-device eval on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snag_tpu.eval.ranking import full_rank_eval
from snag_tpu.eval.sharded import sharded_full_rank_eval
from snag_tpu.parallel.mesh import make_mesh


def _embs(n=601, d=48, seed=0):
    rng = np.random.default_rng(seed)
    l = rng.normal(size=(n, d)).astype(np.float32)
    # right side = noisy copy so gold ranks span a realistic range
    r = l + 0.6 * rng.normal(size=(n, d)).astype(np.float32)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    return jnp.asarray(l), jnp.asarray(r)


@pytest.mark.parametrize("use_csls", [False, True])
def test_sharded_matches_single_device(use_csls):
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    emb_l, emb_r = _embs()   # n=601: exercises the pad path (601 % 8 != 0)

    ref = full_rank_eval(emb_l, emb_r, csls_k=3, use_csls=use_csls,
                         with_top3=True)
    ranks_l2r, ranks_r2l, top3 = sharded_full_rank_eval(
        mesh, emb_l, emb_r, csls_k=3, use_csls=use_csls)

    assert (ranks_l2r == ref.ranks_l2r).mean() > 0.995   # fp-tiling ties
    mrr = float((1.0 / (ranks_l2r + 1)).mean())
    assert abs(mrr - ref.mrr_l2r) < 1e-3
    mrr_r = float((1.0 / (ranks_r2l + 1)).mean())
    # reference r2l summarized the same way
    ref_mrr_r = ref.mrr_r2l
    assert abs(mrr_r - ref_mrr_r) < 1e-3
    assert (top3[:, 0] == np.asarray(ref.top3_l2r)[:, 0]).mean() > 0.995


@pytest.mark.parametrize("n_left", [512, 601])
def test_sharded_mining_matches_chunked(n_left):
    """Sharded mutual-NN mining == single-device chunked mining, including
    the first-occurrence argmin tie-break and the pad path."""
    from snag_tpu.train.il import (_mutual_argmins_chunked,
                                   _mutual_argmins_sharded)
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    n_ent = 1500
    emb = rng.normal(size=(n_ent, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb = jnp.asarray(emb)
    left = jnp.asarray(rng.choice(n_ent, size=n_left, replace=False))
    right = jnp.asarray(rng.choice(n_ent, size=500, replace=False))
    lval = jnp.asarray(rng.random(n_left) > 0.1)
    rval = jnp.asarray(rng.random(500) > 0.1)

    pl_ref, pr_ref = _mutual_argmins_chunked(emb, left, lval, right, rval,
                                             chunk=128)
    pl, pr = _mutual_argmins_sharded(mesh, emb, left, lval, right, rval,
                                     chunk=128)
    assert (np.asarray(pl) == np.asarray(pl_ref)).all()
    assert (np.asarray(pr) == np.asarray(pr_ref)).all()
