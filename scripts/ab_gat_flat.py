"""A/B: flat-grid vs tiled-grid GAT kernels (tile_segment.FLAT_GRID) at
bench geometry, plus TPU grad parity of the two modes.

The tiled grid is (n_tiles, max_chunks) — rectangular, so short tiles burn
bubble steps with dummy DMAs (~31% of the grid at the 30K/330K-edge bench
graph) and hub tiles spill to XLA segment_sum tails.  The flat grid runs
exactly the real (tile, chunk) work items.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_gat_flat.py
Env: AB_ITERS=30
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("AB_ITERS", "30"))


def chain_ms(jitted, *args):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000, out


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn
    import snag_tpu.ops.pallas.tile_segment as tsg
    import optax

    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=30000, synth_rels=2000, synth_triples=150000,
        synth_img_dim=2048, exp_name="abflat", data_rate=0.3,
        dtype="bfloat16",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    key0 = jax.random.PRNGKey(7)

    results = {}
    for flat in (True, False):
        tsg.FLAT_GRID = flat
        model = build_model(cfg, data)
        state = create_train_state(cfg, model, feats, graph,
                                   optax.sgd(1e-3), cfg.random_seed)
        noise_fn = make_noise_fn(cfg, stats)
        nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
        jax.block_until_ready(nfeats.img)

        @jax.jit
        def run(params, nfeats, graph, links, valid, k0):
            eparams = params["multimodal_encoder"]
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                pe = {**eparams,
                      "entity_emb": eparams["entity_emb"] + delta}
                p2 = {**params, "multimodal_encoder": pe}
                def f(p):
                    loss, _ = model.apply(
                        {"params": p}, links, valid, nfeats, graph,
                        entity_noise_key=key, deterministic=False,
                        rngs={"dropout": key})
                    return loss
                l, g = jax.value_and_grad(f)(p2)
                tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g))
                return (tot * 1e-12, key), (l, g)
            (d, _), (ls, _) = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                           jnp.arange(K))
            return d, ls[0]

        ms, _ = chain_ms(run, state.params, nfeats, graph, links, valid,
                         key0)

        # single fwd+bwd for grad parity between the modes (deterministic)
        @jax.jit
        def one(params, nfeats, graph, links, valid):
            def f(p):
                loss, _ = model.apply(
                    {"params": p}, links, valid, nfeats, graph,
                    entity_noise_key=None, deterministic=True)
                return loss
            return jax.value_and_grad(f)(params)

        loss, grads = one(state.params, nfeats, graph, links, valid)
        results[flat] = (ms, float(loss), grads)
        print(f"FLAT_GRID={int(flat)}: model fwd+bwd {ms:8.2f} ms "
              f"(deterministic loss {float(loss):.6f})")
    tsg.FLAT_GRID = True

    la, lb = results[True][1], results[False][1]
    print(f"loss rel diff flat-vs-tiled: "
          f"{abs(la - lb) / max(abs(lb), 1e-9):.2e}")
    ga = jax.tree_util.tree_leaves(results[True][2])
    gb = jax.tree_util.tree_leaves(results[False][2])
    worst = 0.0
    for a_, b_ in zip(ga, gb):
        a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
        denom = max(float(np.abs(b_).max()), 1e-9)
        worst = max(worst, float(np.abs(a_ - b_).max()) / denom)
    print(f"grad worst rel-to-max diff flat-vs-tiled: {worst:.2e}")


if __name__ == "__main__":
    main()
