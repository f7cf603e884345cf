"""Chained timing of the EXACT SNAG loss bundle on fixed encoder outputs,
via the model's own methods — isolates whether the F-(E+loss) gap lives in
the loss assembly or in the encoder<->loss composition.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_loss_exact.py
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
    def enc_all(params, nfeats, graph, k):
        return model.apply(
            {"params": params}, nfeats, graph, k, False,
            rngs={"dropout": k},
            method=lambda m, f_, g, kk, d: m.multimodal_encoder(
                f_, g, entity_noise_key=kk, deterministic=d))
    enc = enc_all(params, nfeats, graph, key0)
    jax.block_until_ready(enc.joint)

    # EXACT model loss bundle on a fixed EncoderOutput, grads wrt enc+params
    def bundle(p, enc, links, valid):
        def run(m, e, l, v):
            hid = m.generate_hidden_emb(e.hidden)
            gph_h, rel_h, att_h, img_h, name_h, char_h = hid
            from snag_tpu.losses.contrastive import icl_loss_stacked
            md = jnp.bfloat16
            gmi = icl_loss_stacked((e.joint, e.joint_fz), l, tau=m.cfg.tau,
                                   ab_weight=m.cfg.ab_weight, valid=v,
                                   matmul_dtype=md)
            ecia = m.inner_view_loss(e.gph, e.rel, e.att, e.img, e.name,
                                     e.char, l, v, weight_norm=e.weight_norm)
            iir = m.inner_view_loss(gph_h, rel_h, att_h, img_h, name_h,
                                    char_h, l, v)
            return gmi + ecia + iir
        return model.apply({"params": p}, enc, links, valid, method=run)

    @jax.jit
    def loss_exact_chain(params, enc, links, valid):
        def body(carry, i):
            delta = carry
            enc2 = type(enc)(*[None if x is None else x + delta for x in enc])
            val, (g_enc,) = jax.value_and_grad(
                lambda e: bundle(params, e, links, valid), argnums=(0,))(enc2)
            return (g_enc.joint.sum() * 1e-12).astype(jnp.float32), None
        d, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return d

    ms1 = chain_ms(loss_exact_chain, params, enc, links, valid)

    # same but grads wrt PARAMS too (Kendall sigmas etc.)
    @jax.jit
    def loss_exact_chain2(params, enc, links, valid):
        def body(carry, i):
            delta = carry
            enc2 = type(enc)(*[None if x is None else x + delta for x in enc])
            val, (g_enc, g_p) = jax.value_and_grad(
                lambda e, p: bundle(p, e, links, valid),
                argnums=(0, 1))(enc2, params)
            tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g_p))
            return ((g_enc.joint.sum() + tot) * 1e-12).astype(jnp.float32), None
        d, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return d

    ms2 = chain_ms(loss_exact_chain2, params, enc, links, valid)

    print(f"exact loss bundle fwd+bwd (wrt enc):        {ms1:8.2f} ms")
    print(f"exact loss bundle fwd+bwd (wrt enc+params): {ms2:8.2f} ms")


if __name__ == "__main__":
    main()
