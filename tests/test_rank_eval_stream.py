"""Streaming rank-eval kernels vs the dense XLA evaluator.

Interpret mode on the CPU test mesh; scripts/check_rank_eval_tpu.py A/Bs
the compiled kernels on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import snag_tpu.ops.pallas.rank_eval as rk
from snag_tpu.eval.ranking import _eval_core


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(rk, "FORCE_INTERPRET", True)


def _embs(n, d, seed=0):
    rng = np.random.default_rng(seed)
    l = rng.normal(size=(n, d)).astype(np.float32)
    r = l + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    return jnp.asarray(l), jnp.asarray(r)


@pytest.mark.parametrize("n,use_csls", [(150, False), (150, True),
                                        (300, True)])
def test_streaming_ranks_match_dense(force_interpret, n, use_csls):
    emb_l, emb_r = _embs(n, 32, seed=n)
    got_l2r, got_r2l, got_top3 = rk.streaming_rank_eval(
        emb_l, emb_r, 3, use_csls, True)
    _, want_l2r, want_r2l, want_top3 = _eval_core(
        emb_l, emb_r, 3, use_csls, 2, True)
    np.testing.assert_array_equal(np.asarray(got_l2r), np.asarray(want_l2r))
    np.testing.assert_array_equal(np.asarray(got_r2l), np.asarray(want_r2l))
    np.testing.assert_array_equal(np.asarray(got_top3),
                                  np.asarray(want_top3))


def test_streaming_via_full_rank_eval(force_interpret):
    """full_rank_eval dispatches to the kernels when they are available and
    produces identical metrics."""
    from snag_tpu.eval.ranking import full_rank_eval
    emb_l, emb_r = _embs(200, 24, seed=9)
    got = full_rank_eval(emb_l, emb_r, csls_k=3, use_csls=True,
                         with_top3=True)
    rk.FORCE_INTERPRET = False      # XLA fallback path
    want = full_rank_eval(emb_l, emb_r, csls_k=3, use_csls=True,
                          with_top3=True)
    rk.FORCE_INTERPRET = True
    np.testing.assert_array_equal(got.ranks_l2r, want.ranks_l2r)
    assert got.mrr_l2r == want.mrr_l2r
    assert got.mrr_r2l == want.mrr_r2l
    np.testing.assert_array_equal(got.acc_l2r, want.acc_l2r)
    np.testing.assert_array_equal(got.top3_l2r, want.top3_l2r)


def test_streaming_csls_k10(force_interpret):
    emb_l, emb_r = _embs(140, 16, seed=3)
    got_l2r, got_r2l, _ = rk.streaming_rank_eval(emb_l, emb_r, 10, True,
                                                 False)
    _, want_l2r, want_r2l, _ = _eval_core(emb_l, emb_r, 10, True, 2, False)
    np.testing.assert_array_equal(np.asarray(got_l2r), np.asarray(want_l2r))
    np.testing.assert_array_equal(np.asarray(got_r2l), np.asarray(want_r2l))
