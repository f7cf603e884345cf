"""A/B: tiny-M attention core "broadcast" vs "unrolled" formulation
(snag_tpu.ops.fusion.TINY_ATTN_IMPL) on the model fwd+bwd chain.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_tiny_attn.py
Env overrides: AB_LAYERS / AB_HEADS / AB_SURFACE (default = bench geometry).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def chain_ms(jitted, *args):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    n_layers = int(os.environ.get("AB_LAYERS", "1"))
    n_heads = int(os.environ.get("AB_HEADS", "1"))
    surface = int(os.environ.get("AB_SURFACE", "0"))
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.ops import fusion
    from snag_tpu.train.step import create_train_state, make_noise_fn
    import optax

    base = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=n_heads,
        num_hidden_layers=n_layers, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=surface,
        inner_view_num=6 if surface else 4, add_noise=1,
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
    key0 = jax.random.PRNGKey(7)

    model = build_model(base, data)
    state = create_train_state(base, model, feats, graph, optax.sgd(1e-3),
                               base.random_seed)
    params = state.params
    noise_fn = make_noise_fn(base, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    jax.block_until_ready(nfeats.img)

    for impl, fold in (("broadcast", True), ("unrolled", True),
                       ("broadcast", False), ("broadcast", True)):
        fusion.TINY_ATTN_IMPL = impl
        fusion.FOLD_QKV = fold

        @jax.jit
        def run(params, nfeats, graph, links, valid, k0):
            eparams = params["multimodal_encoder"]
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                pe = {**eparams, "entity_emb": eparams["entity_emb"] + delta}
                p2 = {**params, "multimodal_encoder": pe}
                def f(p):
                    loss, _ = model.apply(
                        {"params": p}, links, valid, nfeats, graph,
                        entity_noise_key=key, deterministic=False,
                        rngs={"dropout": key})
                    return loss
                g = jax.grad(f)(p2)
                tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g))
                return (tot * 1e-12, key), None
            (d, _), _ = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                     jnp.arange(K))
            return d

        ms = chain_ms(run, params, nfeats, graph, links, valid, key0)
        print(f"layers={n_layers} heads={n_heads} surface={surface} "
              f"impl={impl} fold_qkv={fold}: model fwd+bwd {ms:8.2f} ms")


if __name__ == "__main__":
    main()
