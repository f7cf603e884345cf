"""Multi-chip behavior on the virtual 8-device CPU mesh (SURVEY §4c):
the sharded train step must match the single-device step numerically, and
the sharded eval must match the replicated one."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from snag_tpu.models import build_model
from snag_tpu.models.encoder import prepare_features, prepare_stats
from snag_tpu.parallel.mesh import (batch_sharding, entity_sharding,
                                    make_mesh, replicated)
from snag_tpu.train.optim import build_optimizer
from snag_tpu.train.step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup(synth_cfg, synth_data):
    cfg = dataclasses.replace(synth_cfg, add_noise=0, dropout=0.0)
    data = synth_data
    feats = prepare_features(cfg, data)
    graph = data.graph
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    tx, _ = build_optimizer(cfg, state.params, total_steps=100, warmup_steps=10)
    state = type(state)(params=state.params, opt_state=tx.init(state.params),
                        step=jnp.zeros((), jnp.int32), base_key=state.base_key)
    step = make_train_step(cfg, model, tx, None)
    b = 32
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    return cfg, model, state, step, links, valid, feats, graph


def test_sharded_step_matches_single_device(setup):
    cfg, model, state, step, links, valid, feats, graph = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    # single-device result (the step donates its state arg — feed a copy)
    def tree_copy(t):
        return jax.tree_util.tree_map(lambda x: x.copy(), t)
    s1, loss1, _ = step(tree_copy(state), links, valid, feats, graph,
                        jnp.asarray(0))

    # sharded: entities/edges over the mesh, batch rows over the mesh,
    # params replicated
    mesh = make_mesh(8)
    ent2, ent1, rep = (entity_sharding(mesh, 2), entity_sharding(mesh, 1),
                       replicated(mesh))
    feats_s = type(feats)(*[None if f is None else jax.device_put(f, ent2)
                            for f in feats])
    import dataclasses as _dc
    graph_s = _dc.replace(graph,
                          row=jax.device_put(jnp.asarray(graph.row), ent1),
                          col=jax.device_put(jnp.asarray(graph.col), ent1),
                          w=jax.device_put(jnp.asarray(graph.w), ent1),
                          mask=jax.device_put(jnp.asarray(graph.mask), ent1))
    state_s = type(state)(params=jax.device_put(tree_copy(state.params), rep),
                          opt_state=jax.device_put(tree_copy(state.opt_state), rep),
                          step=state.step, base_key=state.base_key)
    links_s = jax.device_put(links, batch_sharding(mesh, 2))
    valid_s = jax.device_put(valid, batch_sharding(mesh, 1))

    s8, loss8, _ = step(state_s, links_s, valid_s, feats_s, graph_s,
                        jnp.asarray(0))
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)

    # updated params agree
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_sharded_eval_matches(setup):
    from snag_tpu.eval.ranking import full_rank_eval
    cfg, model, state, step, links, valid, feats, graph = setup
    from snag_tpu.train.step import make_embed_fn
    embed = make_embed_fn(cfg, model)
    joint, _ = embed(state.params, feats, graph)
    emb = joint / jnp.linalg.norm(joint, axis=1, keepdims=True)
    l = emb[:24]
    r = emb[24:48]
    res1 = full_rank_eval(l, r)

    mesh = make_mesh(8)
    l_s = jax.device_put(l, batch_sharding(mesh, 2))
    r_s = jax.device_put(r, batch_sharding(mesh, 2))
    res8 = full_rank_eval(l_s, r_s)
    np.testing.assert_array_equal(res1.ranks_l2r, res8.ranks_l2r)
