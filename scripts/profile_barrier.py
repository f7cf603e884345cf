"""Measure the effect of the modal-embedding optimization_barrier:
all-outputs encoder fwd (eval + train mode) and the full train step.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_barrier.py
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
    tx = optax.adamw(1e-4)
    state = type(state)(params=params, opt_state=tx.init(params),
                        step=jnp.zeros((), jnp.int32), base_key=state.base_key)
    step = make_train_step(cfg, model, tx, stats)

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

    def enc_apply(p, feats, graph, key, det, drop_key):
        return model.apply(
            {"params": p}, feats, graph, key, det,
            rngs={"dropout": drop_key},
            method=lambda m, f, g, k, d: m.multimodal_encoder(
                f, g, entity_noise_key=k, deterministic=d))

    def consume(enc):
        return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                + enc.weight_norm.sum())

    @jax.jit
    def v_eval(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, None,
                                 True, k))
    ms1 = timeit_vary(v_eval, lambda i: (params, nfeats, graph, keyed(i),
                                         jnp.float32(i * 1e-9)))

    @jax.jit
    def v_train(params, feats, graph, k, s):
        return consume(enc_apply(perturb(params, s), feats, graph, k,
                                 False, k))
    ms2 = timeit_vary(v_train, lambda i: (params, nfeats, graph, keyed(i),
                                          jnp.float32(i * 1e-9)))

    # full step via the production make_train_step (state varies by itself)
    s0, loss, _ = step(state, links, valid, nfeats, graph, jnp.asarray(0))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        s0, loss, _ = step(s0, links, valid, nfeats, graph, jnp.asarray(i))
    jax.block_until_ready(loss)
    ms3 = (time.perf_counter() - t0) / n * 1000

    print(f"encoder fwd eval (all outputs):   {ms1:8.2f} ms")
    print(f"encoder fwd train (all outputs):  {ms2:8.2f} ms")
    print(f"full train step:                  {ms3:8.2f} ms")


if __name__ == "__main__":
    main()
