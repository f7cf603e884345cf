"""Chained timing: optimizer update on the param TREE vs ONE flat vector.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_opt.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

K = 30


def chain_ms(jitted, *args):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000


def main():
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features
    from snag_tpu.train.step import create_train_state
    from snag_tpu.train.optim import build_optimizer

    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        hidden_units="300,300,300", heads="2,2", attr_dim=300, img_dim=300,
        name_dim=300, char_dim=300, hidden_size=300, intermediate_size=400,
        num_attention_heads=1, num_hidden_layers=1, structure_encoder="gat",
        use_surface=0, inner_view_num=4, random_seed=3408,
        synth_ents=30000, synth_rels=2000, synth_triples=150000,
        synth_img_dim=2048, exp_name="prof", data_rate=0.3, dtype="bfloat16")
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, data.graph,
                               optax.sgd(1e-3), cfg.random_seed)
    params = state.params
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"leaves={n_leaves} params={n_params/1e6:.1f}M")

    tx, _ = build_optimizer(cfg, params, total_steps=1000, warmup_steps=100)
    opt_state = tx.init(params)

    @jax.jit
    def tree_update(params, opt_state, s):
        def body(carry, i):
            p, o = carry
            g = jax.tree_util.tree_map(lambda x: x * 0 + s, p)
            u, o = tx.update(g, o, p)
            p = optax.apply_updates(p, u)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (params, opt_state), jnp.arange(K))
        return p["multimodal_encoder"]["entity_emb"][0, 0]

    ms1 = chain_ms(tree_update, params, opt_state, jnp.float32(1e-9))

    # flat adamw equivalent: one vector, element-wise lr/wd masks
    flat, _ = jax.flatten_util.ravel_pytree(params)
    m0 = jnp.zeros_like(flat)

    @jax.jit
    def flat_update(flat, m, v, s):
        def body(carry, i):
            f, m, v = carry
            g = jnp.full_like(f, s)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            upd = m / (jnp.sqrt(v) + 1e-8)
            f = f - 1e-4 * upd - 1e-4 * 0.01 * f
            return (f, m, v), None
        (f, m, v), _ = jax.lax.scan(body, (flat, m, v), jnp.arange(K))
        return f[0]

    ms2 = chain_ms(flat_update, flat, m0, m0, jnp.float32(1e-9))

    print(f"tree optimizer update ({n_leaves} leaves): {ms1:8.2f} ms")
    print(f"flat adamw update (1 vector):              {ms2:8.2f} ms")


if __name__ == "__main__":
    main()
