"""Varying-input profiling of the FULL step decomposition.

Lesson from profile_encoder2: same-args repeat dispatches through the axon
tunnel give garbage timings; every phase here perturbs an input per call.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step3.py
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
    from snag_tpu.models.encoder import MultiModalEncoder, prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn, make_train_step
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
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        reps = -(-b // links.shape[0])
        links = jnp.tile(links, (reps, 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
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

    # 1. encoder fwd, TRAIN mode (noise + dropout)
    @jax.jit
    def enc_train(params, feats, graph, k, s):
        p = perturb(params, s)
        enc = model.apply(
            {"params": p}, feats, graph, k, False, rngs={"dropout": k},
            method=lambda m, f, g, key, det: m.multimodal_encoder(
                f, g, entity_noise_key=key, deterministic=det))
        return enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()

    ms1 = timeit_vary(enc_train, lambda i: (params, nfeats, graph, keyed(i),
                                            jnp.float32(i * 1e-9)))

    # 2. encoder fwd+bwd (train mode)
    @jax.jit
    def enc_fb(params, feats, graph, k, s):
        def f(p):
            enc = model.apply(
                {"params": perturb(p, s)}, feats, graph, k, False,
                rngs={"dropout": k},
                method=lambda m, f_, g, key, det: m.multimodal_encoder(
                    f_, g, entity_noise_key=key, deterministic=det))
            return enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
        g = jax.grad(f)(params)
        return g["multimodal_encoder"]["entity_emb"][0, 0]

    ms2 = timeit_vary(enc_fb, lambda i: (params, nfeats, graph, keyed(i),
                                         jnp.float32(i * 1e-9)))

    # 3. full loss_fn fwd+bwd (model.__call__: encoder + all losses)
    @jax.jit
    def model_fb(params, links, valid, feats, graph, k, s):
        def f(p):
            loss, aux = model.apply(
                {"params": perturb(p, s)}, links, valid, feats, graph,
                entity_noise_key=k, deterministic=False, rngs={"dropout": k})
            return loss
        loss, g = jax.value_and_grad(f)(params)
        return loss

    ms3 = timeit_vary(model_fb, lambda i: (params, links, valid, nfeats,
                                           graph, keyed(i),
                                           jnp.float32(i * 1e-9)))

    # 4. 3 + adamw update (= full step sans state donation)
    @jax.jit
    def full_step(params, opt_state, links, valid, feats, graph, k, s):
        def f(p):
            loss, aux = model.apply(
                {"params": perturb(p, s)}, links, valid, feats, graph,
                entity_noise_key=k, deterministic=False, rngs={"dropout": k})
            return loss
        loss, g = jax.value_and_grad(f)(params)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss, new_params, new_opt

    ms4 = timeit_vary(full_step,
                      lambda i: (params, opt_state, links, valid, nfeats,
                                 graph, keyed(i), jnp.float32(i * 1e-9)))

    # 5. model fwd only (loss value, no grad)
    @jax.jit
    def model_f(params, links, valid, feats, graph, k, s):
        loss, aux = model.apply(
            {"params": perturb(params, s)}, links, valid, feats, graph,
            entity_noise_key=k, deterministic=False, rngs={"dropout": k})
        return loss

    ms5 = timeit_vary(model_f, lambda i: (params, links, valid, nfeats,
                                          graph, keyed(i),
                                          jnp.float32(i * 1e-9)))

    print(f"1 encoder fwd train-mode:          {ms1:8.2f} ms")
    print(f"2 encoder fwd+bwd:                 {ms2:8.2f} ms")
    print(f"5 model fwd (enc+losses):          {ms5:8.2f} ms")
    print(f"3 model fwd+bwd:                   {ms3:8.2f} ms")
    print(f"4 model fwd+bwd+adamw:             {ms4:8.2f} ms")


if __name__ == "__main__":
    main()
