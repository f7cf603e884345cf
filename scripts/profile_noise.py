"""Isolate the train-mode encoder overhead: noise vs dropout vs RNG.

All variants consume ALL encoder outputs (no DCE) and vary inputs per call.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_noise.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_vary(fn, mk_args, n=20):
    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*mk_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


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

    def perturb(p, s):
        q = dict(p)
        e = dict(q["multimodal_encoder"])
        e["entity_emb"] = e["entity_emb"] + s
        q["multimodal_encoder"] = e
        return q

    def keyed(i):
        return jax.random.fold_in(jax.random.PRNGKey(42), i)

    def enc_apply(p, feats, graph, key, det, drop_key):
        return model.apply(
            {"params": p}, feats, graph, key, det,
            rngs={"dropout": drop_key},
            method=lambda m, f, g, k, d: m.multimodal_encoder(
                f, g, entity_noise_key=k, deterministic=d))

    def consume(enc):
        tot = enc.joint.sum() + enc.hidden.sum() + enc.weight_norm.sum()
        if enc.joint_fz is not None:
            tot = tot + enc.joint_fz.sum()
        return tot

    # 1. eval mode, all outputs
    @jax.jit
    def v1(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, None,
                                 True, k))
    ms1 = timeit_vary(v1, lambda i: (params, nfeats, graph, keyed(i),
                                     jnp.float32(i * 1e-9)))

    # 2. dropout only (no entity noise)
    @jax.jit
    def v2(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, None,
                                 False, k))
    ms2 = timeit_vary(v2, lambda i: (params, nfeats, graph, keyed(i),
                                     jnp.float32(i * 1e-9)))

    # 3. entity noise only (deterministic fusion)
    @jax.jit
    def v3(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, k,
                                 True, k))
    ms3 = timeit_vary(v3, lambda i: (params, nfeats, graph, keyed(i),
                                     jnp.float32(i * 1e-9)))

    # 4. both
    @jax.jit
    def v4(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, k,
                                 False, k))
    ms4 = timeit_vary(v4, lambda i: (params, nfeats, graph, keyed(i),
                                     jnp.float32(i * 1e-9)))

    # 5. RNG microbenches
    @jax.jit
    def rng_dropout_masks(k, s):
        k1, k2, k3 = jax.random.split(k, 3)
        a = jax.random.bernoulli(k1, 0.9, (30000, 1, 4, 4))
        b = jax.random.bernoulli(k2, 0.9, (30000, 4, 300))
        c = jax.random.bernoulli(k3, 0.9, (30000, 4, 300))
        return (a.sum() + b.sum() + c.sum()).astype(jnp.float32) + s
    ms5 = timeit_vary(rng_dropout_masks, lambda i: (keyed(i),
                                                    jnp.float32(i)))

    @jax.jit
    def rng_entity_noise(k, emb, s):
        from snag_tpu.ops import noise as noise_ops
        return noise_ops.entity_noise(k, emb + s, 0.2, 0.7).sum()
    emb = params["multimodal_encoder"]["entity_emb"]
    ms6 = timeit_vary(rng_entity_noise, lambda i: (keyed(i), emb,
                                                   jnp.float32(i * 1e-9)))

    print(f"1 eval mode (all outputs):         {ms1:8.2f} ms")
    print(f"2 dropout only:                    {ms2:8.2f} ms")
    print(f"3 entity noise only:               {ms3:8.2f} ms")
    print(f"4 both (train mode):               {ms4:8.2f} ms")
    print(f"5 three dropout masks RNG:         {ms5:8.2f} ms")
    print(f"6 entity_noise op alone:           {ms6:8.2f} ms")


if __name__ == "__main__":
    main()
