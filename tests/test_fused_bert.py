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


def test_fused_full_snag_model_matches_eager():
    """Whole SNAG model: fused Mformer branch vs eager — identical loss
    and grads on the same params (deterministic, CPU interpret)."""
    import dataclasses
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features

    base = Config(data_choice="SYNTH", model_name="SNAG", batch_size=16,
                  hidden_units="32,32,32", heads="2,2", attr_dim=32,
                  img_dim=32, name_dim=32, char_dim=32, hidden_size=32,
                  intermediate_size=48, num_attention_heads=1,
                  num_hidden_layers=1, use_surface=0, inner_view_num=4,
                  random_seed=11, synth_ents=150, synth_triples=500,
                  synth_img_dim=24, exp_name="t", data_rate=0.3)
    base = finalize_config(base, data_root="/tmp/snag_fused_test")
    data = load_data(base)
    feats = prepare_features(base, data)
    graph = data.graph
    links = jnp.asarray(data.train_ill[:16].astype(np.int64))
    valid = jnp.ones((links.shape[0],), bool)

    def run(fused_flag):
        cfg = dataclasses.replace(base, fused_mformer=fused_flag)
        model = build_model(cfg, data)
        def f(p):
            loss, _ = model.apply({"params": p}, links, valid, feats, graph,
                                  deterministic=True)
            return loss
        return model, f

    m0, f0 = run(0)
    params = m0.init({"params": jax.random.PRNGKey(0)}, links, valid,
                     feats, graph, deterministic=True)["params"]
    with mock.patch.object(pl, "pallas_call", _interp), \
            mock.patch.object(tsg, "pallas_available", lambda: True):
        m1, f1 = run(1)
        p1 = m1.init({"params": jax.random.PRNGKey(0)}, links, valid,
                     feats, graph, deterministic=True)["params"]
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p1))
        v0, g0 = jax.value_and_grad(f0)(params)
        v1, g1 = jax.value_and_grad(f1)(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_tiny_attn_broadcast_matches_unrolled():
    """Both tiny-M attention formulations (values AND grads) agree; the
    unrolled variant stays covered while broadcast is the default."""
    from snag_tpu.ops import fusion
    from snag_tpu.ops.fusion import BertSelfAttention

    rng = np.random.default_rng(0)
    N, M, d, H = 64, 4, 32, 2
    x = jnp.asarray(rng.normal(size=(N, M, d)), jnp.float32)
    mod = BertSelfAttention(d, H)
    params = mod.init(jax.random.PRNGKey(0), x)

    def val_and_grads():
        def f(p, x):
            ctx, probs = mod.apply(p, x)
            return (ctx ** 2).sum() + (probs ** 2).sum()
        v, g = jax.value_and_grad(f)(params, x)
        return v, jax.tree_util.tree_leaves(g)

    assert fusion.TINY_ATTN_IMPL == "broadcast"   # default
    try:
        vb, gb = val_and_grads()
        fusion.TINY_ATTN_IMPL = "unrolled"
        vu, gu = val_and_grads()
    finally:
        fusion.TINY_ATTN_IMPL = "broadcast"
    np.testing.assert_allclose(float(vb), float(vu), rtol=1e-6)
    for a, b in zip(gb, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
