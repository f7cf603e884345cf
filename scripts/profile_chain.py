"""Tunnel-immune profiling: every phase is a lax.scan CHAIN of K dependent
iterations inside ONE dispatch; per-iter time = wall / K.  Dedup, dispatch
overhead, and transfer latency cannot distort these numbers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_chain.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def chain_ms(jitted, *args):
    out = jitted(*args)                     # compile
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
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import (create_train_state, make_noise_fn,
                                     make_train_step)
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
    eparams = params["multimodal_encoder"]

    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        reps = -(-b // links.shape[0])
        links = jnp.tile(links, (reps, 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    jax.block_until_ready(nfeats.img)

    def enc_apply(params, p, nfeats, graph, key, det, drop_key):
        return model.apply(
            {"params": {**params, "multimodal_encoder": p}}, nfeats, graph,
            key, det, rngs={"dropout": drop_key},
            method=lambda m, f, g, k, d: m.multimodal_encoder(
                f, g, entity_noise_key=k, deterministic=d))

    def chained(phase_fn):
        """scan K iters; the carry perturbs entity_emb so iter i+1 depends
        on iter i's output.  All big arrays are jit ARGS (closing over them
        would bake tunnel-killing constants)."""
        @jax.jit
        def run(params, nfeats, graph, links, valid, k0):
            eparams = params["multimodal_encoder"]
            def body(carry, i):
                delta, key = carry
                p = {**eparams, "entity_emb": eparams["entity_emb"] + delta}
                key = jax.random.fold_in(key, i)
                out = phase_fn(params, p, nfeats, graph, links, valid, key)
                return (out * 1e-12, key), None

            (d, _), _ = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                     jnp.arange(K))
            return d
        return run

    key0 = jax.random.PRNGKey(7)

    ARGS = (params, nfeats, graph, links, valid, key0)

    # A. encoder fwd eval, all outputs
    def enc_eval(params, p, nfeats, graph, links, valid, key):
        enc = enc_apply(params, p, nfeats, graph, None, True, key)
        return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                + enc.weight_norm.sum())
    ms_a = chain_ms(chained(enc_eval), *ARGS)

    # B. encoder fwd train (noise + dropout)
    def enc_train(params, p, nfeats, graph, links, valid, key):
        enc = enc_apply(params, p, nfeats, graph, key, False, key)
        return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                + enc.weight_norm.sum())
    ms_b = chain_ms(chained(enc_train), *ARGS)

    # C. GAT only
    def gat_only(params, p, nfeats, graph, links, valid, key):
        out = model.apply(
            {"params": {**params, "multimodal_encoder": p}}, nfeats, graph,
            method=lambda m, f, g: m.multimodal_encoder.cross_graph_model(
                m.multimodal_encoder.entity_emb, g))
        return out.sum()
    ms_c = chain_ms(chained(gat_only), *ARGS)

    # D. projections only
    def proj_only(params, p, nfeats, graph, links, valid, key):
        def run(m, f, g):
            e = m.multimodal_encoder
            return (e.img_fc(f.img).sum() + e.rel_fc(f.rel).sum()
                    + e.att_fc(f.att).sum()
                    + e.entity_emb.sum())    # carry dependency
        return model.apply({"params": {**params, "multimodal_encoder": p}},
                           nfeats, graph, method=run)
    ms_d = chain_ms(chained(proj_only), *ARGS)

    # E. encoder fwd+bwd (train mode)
    def enc_fb(params, p, nfeats, graph, links, valid, key):
        def f(pp):
            enc = enc_apply(params, pp, nfeats, graph, key, False, key)
            return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                    + enc.weight_norm.sum())
        g = jax.grad(f)(p)
        return g["entity_emb"].sum()
    ms_e = chain_ms(chained(enc_fb), *ARGS)

    # F. model fwd+bwd (encoder + losses), grads consumed
    def model_fb(params, p, nfeats, graph, links, valid, key):
        def f(pp):
            loss, _ = model.apply(
                {"params": {**params, "multimodal_encoder": pp}}, links,
                valid, nfeats, graph, entity_noise_key=key,
                deterministic=False, rngs={"dropout": key})
            return loss
        g = jax.grad(f)(p)
        return g["entity_emb"].sum() + sum(
            x.sum() for x in jax.tree_util.tree_leaves(g))
    ms_f = chain_ms(chained(model_fb), *ARGS)

    # G. full production step chain (state threads through)
    tx = optax.adamw(1e-4)
    st = type(state)(params=params, opt_state=tx.init(params),
                     step=jnp.zeros((), jnp.int32), base_key=state.base_key)
    step = make_train_step(cfg, model, tx, stats)
    s1, loss, _ = step(st, links, valid, nfeats, graph, jnp.asarray(0))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(K):
        s1, loss, _ = step(s1, links, valid, nfeats, graph, jnp.asarray(i))
    jax.block_until_ready(loss)
    ms_g = (time.perf_counter() - t0) / K * 1000

    print(f"A encoder fwd eval:      {ms_a:8.2f} ms")
    print(f"B encoder fwd train:     {ms_b:8.2f} ms")
    print(f"C GAT only:              {ms_c:8.2f} ms")
    print(f"D projections only:      {ms_d:8.2f} ms")
    print(f"E encoder fwd+bwd:       {ms_e:8.2f} ms")
    print(f"F model fwd+bwd:         {ms_f:8.2f} ms")
    print(f"G full step (loop):      {ms_g:8.2f} ms")


if __name__ == "__main__":
    main()
