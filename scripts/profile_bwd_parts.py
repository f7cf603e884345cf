"""Chained fwd+bwd timing per encoder sub-module (GAT / projections /
fusion / noise) to locate the ~75 ms backward.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_bwd_parts.py
"""

from __future__ import annotations

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
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import MultiModalEncoder, prepare_features, prepare_stats
    import optax
    from snag_tpu.train.step import create_train_state

    cfg = Config(
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
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    params = state.params
    from snag_tpu.train.step import make_noise_fn
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    jax.block_until_ready(nfeats.img)
    key0 = jax.random.PRNGKey(7)

    def chained(phase_fn):
        @jax.jit
        def run(params, nfeats, graph, k0):
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                out = phase_fn(params, delta, nfeats, graph, key)
                return (out * 1e-12, key), None
            (d, _), _ = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                     jnp.arange(K))
            return d
        return run

    def apply_enc(p, nfeats, graph, key, method):
        return model.apply({"params": p}, nfeats, graph,
                           rngs={"dropout": key}, method=method)

    # 1. GAT fwd+bwd (grads wrt encoder params)
    def gat_fb(params, delta, nfeats, graph, key):
        def f(p):
            pe = dict(p["multimodal_encoder"])
            pe["entity_emb"] = pe["entity_emb"] + delta
            p2 = {**p, "multimodal_encoder": pe}
            out = apply_enc(
                p2, nfeats, graph, key,
                lambda m, f_, g: m.multimodal_encoder.cross_graph_model(
                    m.multimodal_encoder.entity_emb, g))
            return out.sum()
        g = jax.grad(f)(params)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    ms1 = chain_ms(chained(gat_fb), params, nfeats, graph, key0)

    # 2. projections fwd+bwd
    def proj_fb(params, delta, nfeats, graph, key):
        def f(p):
            def run(m, f_, g):
                e = m.multimodal_encoder
                return (e.img_fc(f_.img).sum() + e.rel_fc(f_.rel).sum()
                        + e.att_fc(f_.att).sum() + e.entity_emb.sum() * delta)
            return apply_enc(p, nfeats, graph, key, run)
        g = jax.grad(f)(params)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    ms2 = chain_ms(chained(proj_fb), params, nfeats, graph, key0)

    # 3. fusion fwd+bwd on fixed embeddings (train mode w/ dropout)
    @jax.jit
    def modal_out(params, nfeats, graph):
        return model.apply(
            {"params": params}, nfeats, graph,
            method=lambda m, f_, g: m.multimodal_encoder.modal_embeddings(
                f_, g, None, True))
    gph, img, rel, att, _, _ = modal_out(params, nfeats, graph)
    jax.block_until_ready(gph)

    def fusion_fb_maker():
        @jax.jit
        def run(params, embs, key0):
            img, att, rel, gph = embs
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                def f(p):
                    def runm(m, a, b, c, d):
                        out = m.multimodal_encoder.fusion(
                            [a + delta, b, c, d, None, None],
                            deterministic=False)
                        return (out[0].sum() + out[1].sum() + out[2].sum()
                                + out[3].sum())
                    return model.apply({"params": p}, img, att, rel, gph,
                                       rngs={"dropout": key}, method=runm)
                g = jax.grad(f)(params)
                tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g))
                return (tot * 1e-12, key), None
            (d, _), _ = jax.lax.scan(body, (jnp.float32(0.0), key0),
                                     jnp.arange(K))
            return d
        return run

    ms3 = chain_ms(fusion_fb_maker(), params, (img, att, rel, gph), key0)

    # 4. noise-only fwd+bwd: entity noise blend + sum
    def noise_fb(params, delta, nfeats, graph, key):
        def f(p):
            from snag_tpu.ops import noise as noise_ops
            ent = p["multimodal_encoder"]["entity_emb"] + delta
            return noise_ops.entity_noise(key, ent, cfg.noise_ratio,
                                          cfg.mask_ratio).sum()
        g = jax.grad(f)(params)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    ms4 = chain_ms(chained(noise_fb), params, nfeats, graph, key0)

    print(f"1 GAT fwd+bwd:               {ms1:8.2f} ms")
    print(f"2 projections fwd+bwd:       {ms2:8.2f} ms")
    print(f"3 fusion fwd+bwd (dropout):  {ms3:8.2f} ms")
    print(f"4 entity-noise fwd+bwd:      {ms4:8.2f} ms")


if __name__ == "__main__":
    main()
