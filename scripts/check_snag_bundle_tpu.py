"""TPU check + A/B for the fused SNAG loss bundle (factored GMI).

1. loss value fused vs explicit-joint path at production scale;
2. chained model fwd+bwd timing with the bundle on/off.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_snag_bundle_tpu.py
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn
    import optax
    import scripts.ab_fused as ab

    base = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=30000, synth_rels=2000, synth_triples=150000,
        synth_img_dim=2048, exp_name="prof", data_rate=0.3,
        dtype="bfloat16",
    )
    base = finalize_config(base, data_root="/tmp/snag_bench_data")
    data = load_data(base)
    feats = prepare_features(base, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    b = base.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        reps = -(-b // links.shape[0])
        links = jnp.tile(links, (reps, 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(base, stats)

    vals = {}
    for flag in (1, 0):
        cfg = dataclasses.replace(base, fused_snag_loss=flag)
        model = build_model(cfg, data)
        state = create_train_state(cfg, model, feats, graph,
                                   optax.sgd(1e-3), cfg.random_seed)
        nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))

        @jax.jit
        def val(params, nfeats):
            loss, _ = model.apply({"params": params}, links, valid, nfeats,
                                  graph, deterministic=True)
            return loss

        vals[flag] = float(val(state.params, nfeats))
        print(f"fused_snag_loss={flag}: loss {vals[flag]:.6f}")

        K = 30

        @jax.jit
        def run(params, nfeats, k0):
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                p2 = jax.tree_util.tree_map(lambda x: x, params)
                ee = p2["multimodal_encoder"]["entity_emb"] + delta
                p2 = {**p2, "multimodal_encoder":
                      {**p2["multimodal_encoder"], "entity_emb": ee}}
                def f(p):
                    loss, _ = model.apply(
                        {"params": p}, links, valid, nfeats, graph,
                        entity_noise_key=key, deterministic=False,
                        rngs={"dropout": key})
                    return loss
                g = jax.grad(f)(p2)
                tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g))
                return (tot * 1e-12, key), None
            (d, _), _ = jax.lax.scan(body, (jnp.float32(0.0),
                                            jax.random.PRNGKey(7)),
                                     jnp.arange(K))
            return d

        out = run(state.params, nfeats, 0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(run(state.params, nfeats, 0))
        ms = (time.perf_counter() - t0) / K * 1000
        print(f"fused_snag_loss={flag}: model fwd+bwd {ms:8.2f} ms")

    diff = abs(vals[1] - vals[0]) / max(abs(vals[0]), 1e-9)
    print(f"loss rel diff: {diff:.2e}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    main()
