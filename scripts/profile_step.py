"""Component-level timing of the SNAG train step at bench geometry.

Times (pipelined, one sync per phase):
  A. encoder forward only (joint_emb)
  B. encoder forward+backward (grad wrt params of a sum-of-joint scalar)
  C. losses forward+backward on FIXED embeddings (isolates the loss block
     incl. the emb[links] gather backward scatters)
  D. full train step (reference point = bench.py's step_ms)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
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
    tx = optax.adamw(1e-4)
    state = type(state)(params=state.params, opt_state=tx.init(state.params),
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
    key = jax.random.PRNGKey(0)

    # ---- A. encoder forward only --------------------------------------
    @jax.jit
    def enc_fwd(params, feats, graph):
        enc = model.apply({"params": params}, feats, graph,
                          method=type(model).joint_emb)
        return enc[0].sum()

    ms_a = timeit(enc_fwd, state.params, nfeats, graph)

    # ---- A2. encoder forward, training mode (noise + dropout rngs) ----
    def run_enc(params, feats, graph, k):
        return model.apply(
            {"params": params}, feats, graph, k, False,
            rngs={"dropout": k},
            method=lambda mdl, f, g, key, det: mdl.multimodal_encoder(
                f, g, entity_noise_key=key, deterministic=det))

    @jax.jit
    def enc_fwd_train(params, feats, graph, k):
        enc = run_enc(params, feats, graph, k)
        return enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()

    ms_a2 = timeit(enc_fwd_train, state.params, nfeats, graph, key)

    # ---- B. encoder forward+backward ----------------------------------
    @jax.jit
    def enc_fb(params, feats, graph, k):
        def f(p):
            enc = run_enc(p, feats, graph, k)
            return enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
        return jax.grad(f)(params)

    ms_b = timeit(enc_fb, state.params, nfeats, graph, key)

    # ---- C. loss block on fixed embeddings ------------------------------
    # materialize encoder outputs once, then fwd+bwd only the loss bundle
    @jax.jit
    def enc_out(params, feats, graph, k):
        return run_enc(params, feats, graph, k)

    enc = enc_out(state.params, nfeats, graph, key)
    jax.block_until_ready(enc.joint)

    from snag_tpu.losses.contrastive import icl_loss_stacked, icl_loss_multi
    from snag_tpu.ops.fusion import l2norm

    md = jnp.bfloat16

    @jax.jit
    def loss_fb(enc, links, valid):
        def f(enc):
            gmi = icl_loss_stacked((enc.joint, enc.joint_fz), links,
                                   tau=cfg.tau, valid=valid, matmul_dtype=md)
            act = [e for e in (enc.gph, enc.rel, enc.att, enc.img)
                   if e is not None]
            stack = jnp.stack([l2norm(e) for e in act], axis=0)
            per = icl_loss_multi(stack, links, tau=cfg.tau, valid=valid,
                                 matmul_dtype=md)
            hid = [l2norm(enc.hidden[:, i, :]) for i in range(4)]
            per2 = icl_loss_multi(jnp.stack(hid, axis=0), links, tau=cfg.tau,
                                  valid=valid, matmul_dtype=md)
            return gmi + per.sum() + per2.sum()
        g = jax.grad(f)(enc)
        return g.joint

    ms_c = timeit(loss_fb, enc, links, valid)

    # ---- C2. loss gathers only: emb[links] fwd+bwd ---------------------
    @jax.jit
    def gather_fb(enc, links):
        def f(enc):
            z = jnp.stack([enc.joint[links[:, 0]], enc.joint[links[:, 1]]])
            return (z * z).sum()
        return jax.grad(f)(enc).joint

    ms_c2 = timeit(gather_fb, enc, links)

    # ---- D. full step ---------------------------------------------------
    def full(state):
        state, loss, _ = step(state, links, valid, nfeats, graph,
                              jnp.asarray(0))
        return state, loss

    state2, loss = full(state)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n = 20
    s = state2
    for i in range(n):
        s, loss = full(s)
    jax.block_until_ready(loss)
    ms_d = (time.perf_counter() - t0) / n * 1000

    print(f"A  encoder fwd (eval mode):        {ms_a:8.2f} ms")
    print(f"A2 encoder fwd (train mode):       {ms_a2:8.2f} ms")
    print(f"B  encoder fwd+bwd:                {ms_b:8.2f} ms")
    print(f"C  loss fwd+bwd (fixed embs):      {ms_c:8.2f} ms")
    print(f"C2 emb[links] gather fwd+bwd:      {ms_c2:8.2f} ms")
    print(f"D  full train step:                {ms_d:8.2f} ms")


if __name__ == "__main__":
    main()
