"""A/B: transposed one-hot reduce vs per-head lhs-transposed dots in the
GAT kernels (tile_segment.OHT_REDUCE) at bench geometry, plus TPU grad
parity of the two modes.

The original reduce contracts dim 0 of the (CHUNK, R) one-hot — an
lhs-transposed matmul Mosaic must relayout every grid step — and issues
one dot per head.  The transposed form builds the one-hot directly as
(R, CHUNK), weights the streamed block by e_h (sublane-aligned broadcast,
no relayout), and reduces all heads in ONE standard-orientation
(R, CHUNK) @ (CHUNK, H*c_pad) dot per grid step.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_gat_oht.py
Env: AB_ITERS=30

RESULT (2026-08-20, v5e, bench geometry 30K ents / 330K edges, K=30):
  OHT_REDUCE=1: 38.11 ms   OHT_REDUCE=0: 36.32 ms
The transposed-reduce hypothesis LOST: folding the per-head dots into one
wide (R, CHUNK) @ (CHUNK, H*c_pad) dot makes the step 1.8 ms SLOWER —
Mosaic already amortizes the lhs relayout, and the wide rhs concat adds
VMEM traffic that outweighs it (and the transposed path also failed grad
parity, worst rel-to-max 1.0).  Per the win-or-delete discipline the
OHT_REDUCE branch was deleted from the kernels; this script is kept as the
record.  It now A/Bs a no-op flag unless the branch is reintroduced.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("AB_ITERS", "30"))


def chain_ms(jitted, *args):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000, out


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn
    import snag_tpu.ops.pallas.tile_segment as tsg
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
        synth_img_dim=2048, exp_name="aboht", data_rate=0.3,
        dtype="bfloat16",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    key0 = jax.random.PRNGKey(7)

    results = {}
    for oht in (True, False):
        tsg.OHT_REDUCE = oht
        model = build_model(cfg, data)
        state = create_train_state(cfg, model, feats, graph,
                                   optax.sgd(1e-3), cfg.random_seed)
        noise_fn = make_noise_fn(cfg, stats)
        nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
        jax.block_until_ready(nfeats.img)

        @jax.jit
        def run(params, nfeats, graph, links, valid, k0):
            eparams = params["multimodal_encoder"]
            def body(carry, i):
                delta, key = carry
                key = jax.random.fold_in(key, i)
                pe = {**eparams,
                      "entity_emb": eparams["entity_emb"] + delta}
                p2 = {**params, "multimodal_encoder": pe}
                def f(p):
                    loss, _ = model.apply(
                        {"params": p}, links, valid, nfeats, graph,
                        entity_noise_key=key, deterministic=False,
                        rngs={"dropout": key})
                    return loss
                l, g = jax.value_and_grad(f)(p2)
                tot = sum(x.sum() for x in jax.tree_util.tree_leaves(g))
                return (tot * 1e-12, key), (l, g)
            (d, _), (ls, _) = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                           jnp.arange(K))
            return d, ls[0]

        ms, _ = chain_ms(run, state.params, nfeats, graph, links, valid,
                         key0)

        # single fwd+bwd for grad parity between the modes (deterministic)
        @jax.jit
        def one(params, nfeats, graph, links, valid):
            def f(p):
                loss, _ = model.apply(
                    {"params": p}, links, valid, nfeats, graph,
                    entity_noise_key=None, deterministic=True)
                return loss
            return jax.value_and_grad(f)(params)

        loss, grads = one(state.params, nfeats, graph, links, valid)
        results[oht] = (ms, float(loss), grads)
        print(f"OHT_REDUCE={int(oht)}: model fwd+bwd {ms:8.2f} ms "
              f"(deterministic loss {float(loss):.6f})")
    tsg.OHT_REDUCE = True

    la, lb = results[True][1], results[False][1]
    print(f"loss rel diff oht-vs-perhead: "
          f"{abs(la - lb) / max(abs(lb), 1e-9):.2e}")
    ga = jax.tree_util.tree_leaves(results[True][2])
    gb = jax.tree_util.tree_leaves(results[False][2])
    worst = 0.0
    for a_, b_ in zip(ga, gb):
        a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
        denom = max(float(np.abs(b_).max()), 1e-9)
        worst = max(worst, float(np.abs(a_ - b_).max()) / denom)
    print(f"grad worst rel-to-max diff oht-vs-perhead: {worst:.2e}")


if __name__ == "__main__":
    main()
