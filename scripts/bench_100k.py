"""OEA-100K-scale proof on real hardware (VERDICT r2 item 5).

100K entities (50K aligned pairs), ~500K triples, 2048-d visual features —
the OEA_*_100K geometry (reference config.py:35 dataset list).  Measures:
train step (chained scan), per-epoch noise, full-rank eval over the 35K
test pairs (streaming kernels — the (35K, 35K) matrix would be 4.9 GB and
the old chunked path dozens of dispatches), and the HBM high-water mark.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_100k.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.optim import build_optimizer
    from snag_tpu.train.step import (create_train_state, make_embed_fn,
                                     make_noise_fn, make_train_step)
    from snag_tpu.eval.ranking import full_rank_eval

    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=100_000, synth_rels=2000, synth_triples=500_000,
        synth_img_dim=2048, exp_name="bench100k", data_rate=0.3,
        dtype="bfloat16",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_100k_data")

    t0 = time.time()
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    model = build_model(cfg, data)
    print(f"data+features built in {time.time() - t0:.1f}s; "
          f"edges={graph.row.shape[0]}, test pairs={len(data.test_ill)}")

    import optax
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    tx, _ = build_optimizer(cfg, state.params, total_steps=1000,
                            warmup_steps=100)
    state = type(state)(params=state.params, opt_state=tx.init(state.params),
                        step=jnp.zeros((), jnp.int32),
                        base_key=state.base_key)
    step = make_train_step(cfg, model, tx, stats)

    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))

    n_iter = 10

    @jax.jit
    def run_steps(state, links, valid, nfeats, graph):
        def body(st, i):
            st, loss, _ = step(st, links, valid, nfeats, graph, i)
            return st, loss
        st, losses = jax.lax.scan(body, state, jnp.arange(n_iter))
        return st, losses[-1]

    state, loss = run_steps(state, links, valid, nfeats, graph)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    state, loss = run_steps(state, links, valid, nfeats, graph)
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - t0) / n_iter * 1000

    t0 = time.perf_counter()
    for e in range(3):
        nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(e))
    jax.block_until_ready(nfeats.img)
    noise_ms = (time.perf_counter() - t0) / 3 * 1000

    # full-rank eval over ALL test pairs (~35K x 35K) via streaming kernels
    embed = make_embed_fn(cfg, model)
    joint, _ = embed(state.params, feats, graph)
    joint = joint / jnp.linalg.norm(joint, axis=1, keepdims=True)
    tl = jnp.asarray(data.test_ill[:, 0].astype(np.int64))
    tr = jnp.asarray(data.test_ill[:, 1].astype(np.int64))
    el = jax.block_until_ready(joint[tl])
    er = jax.block_until_ready(joint[tr])
    res = full_rank_eval(el, er, use_csls=True, csls_k=3)      # compile
    el2 = jax.block_until_ready(jax.jit(lambda e: e + 1e-7)(el))
    t0 = time.perf_counter()
    res = full_rank_eval(el2, er, use_csls=True, csls_k=3)
    eval_ms = (time.perf_counter() - t0) * 1000

    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats()
        mem = {"hbm_peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
               "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 2)}
    except Exception:
        pass

    print(json.dumps({
        "metric": "snag_100k_scale",
        "n_entities": cfg.synth_ents,
        "n_edges": int(graph.row.shape[0]),
        "n_test_pairs": int(len(data.test_ill)),
        "step_ms": round(step_ms, 2),
        "noise_ms": round(noise_ms, 2),
        "full_rank_eval_ms_35k": round(eval_ms, 2),
        "eval_mrr_smoke": float(res.mrr_l2r),
        **mem,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
