"""Chained timing: fusion fwd+bwd with/without dropout; loss block fwd+bwd.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_fusion_loss.py
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
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    import optax
    from snag_tpu.train.step import create_train_state, make_noise_fn

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
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    jax.block_until_ready(nfeats.img)
    key0 = jax.random.PRNGKey(7)
    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        reps = -(-b // links.shape[0])
        links = jnp.tile(links, (reps, 1))[:b]
    valid = jnp.ones((b,), dtype=bool)

    @jax.jit
    def modal_out(params, nfeats, graph):
        return model.apply(
            {"params": params}, nfeats, graph,
            method=lambda m, f_, g: m.multimodal_encoder.modal_embeddings(
                f_, g, None, True))
    gph, img, rel, att, _, _ = modal_out(params, nfeats, graph)
    jax.block_until_ready(gph)

    def fusion_chain(det):
        @jax.jit
        def run(params, embs, key0):
            img, att, rel, gph = embs
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                def f(p):
                    def runm(m, a, bb, c, d):
                        out = m.multimodal_encoder.fusion(
                            [a + delta, bb, c, d, None, None],
                            deterministic=det)
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

    ms1 = chain_ms(fusion_chain(False), params, (img, att, rel, gph), key0)
    ms2 = chain_ms(fusion_chain(True), params, (img, att, rel, gph), key0)

    # loss block fwd+bwd on fixed encoder outputs
    @jax.jit
    def enc_all(params, nfeats, graph, k):
        return model.apply(
            {"params": params}, nfeats, graph, k, False,
            rngs={"dropout": k},
            method=lambda m, f_, g, kk, d: m.multimodal_encoder(
                f_, g, entity_noise_key=kk, deterministic=d))
    enc = enc_all(params, nfeats, graph, key0)
    jax.block_until_ready(enc.joint)

    from snag_tpu.losses.contrastive import icl_loss_stacked, icl_loss_multi
    from snag_tpu.ops.fusion import l2norm
    md = jnp.bfloat16

    @jax.jit
    def loss_chain(enc, links, valid, params):
        mll = params["multi_loss_layer"]
        def body(carry, i):
            delta = carry
            def f(e):
                gmi = icl_loss_stacked((e.joint + delta, e.joint_fz), links,
                                       tau=cfg.tau, valid=valid,
                                       matmul_dtype=md)
                act = [e.gph, e.rel, e.att, e.img]
                stack = jnp.stack([l2norm(x) for x in act], axis=0)
                per = icl_loss_multi(stack, links, tau=cfg.tau, valid=valid,
                                     matmul_dtype=md)
                hid = [l2norm(e.hidden[:, i2, :]) for i2 in range(4)]
                per2 = icl_loss_multi(jnp.stack(hid, axis=0), links,
                                      tau=cfg.tau, valid=valid,
                                      matmul_dtype=md)
                return gmi + per.sum() + per2.sum()
            g = jax.grad(f)(enc)
            return (g.joint.sum() * 1e-12).astype(jnp.float32), None
        d, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return d

    ms3 = chain_ms(loss_chain, enc, links, valid, params)

    # GMI alone (d=1200 pair)
    @jax.jit
    def gmi_chain(enc, links, valid):
        def body(carry, i):
            delta = carry
            def f(e):
                return icl_loss_stacked((e.joint + delta, e.joint_fz), links,
                                        tau=cfg.tau, valid=valid,
                                        matmul_dtype=md)
            g = jax.grad(f)(enc)
            return (g.joint.sum() * 1e-12).astype(jnp.float32), None
        d, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return d

    ms4 = chain_ms(gmi_chain, enc, links, valid)

    print(f"fusion fwd+bwd, dropout on:   {ms1:8.2f} ms")
    print(f"fusion fwd+bwd, deterministic:{ms2:8.2f} ms")
    print(f"loss block fwd+bwd:           {ms3:8.2f} ms")
    print(f"GMI (2x d=1200) fwd+bwd:      {ms4:8.2f} ms")


if __name__ == "__main__":
    main()
