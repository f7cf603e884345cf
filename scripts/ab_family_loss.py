"""A/B: simple-icl_loss streaming routing (losses/contrastive.ROUTE_SIMPLE_ICL)
for the non-SNAG families at bench geometry (VERDICT r3 next item 8).

MEAformer (joint ICL, non-replay) and MCLEA (joint + 6 per-modality ICLs)
are the call sites that previously materialized dense (2B, 2B) logits as
autodiff residuals; EVA uses NCA losses only and is unaffected.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_family_loss.py
Env: AB_MODELS=MEAformer,MCLEA  AB_ITERS=30
"""

from __future__ import annotations

import dataclasses
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
    return (time.perf_counter() - t0) / K * 1000


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn
    import snag_tpu.losses.contrastive as C
    import optax

    models = os.environ.get("AB_MODELS", "MEAformer,MCLEA").split(",")
    for model_name in models:
        base = Config(
            data_choice="SYNTH", model_name=model_name, batch_size=3500,
            lr=5e-4, hidden_units="300,300,300", heads="2,2",
            attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
            hidden_size=300, intermediate_size=400, num_attention_heads=1,
            num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
            tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
            noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
            synth_ents=30000, synth_rels=2000, synth_triples=150000,
            synth_img_dim=2048, exp_name="abfam", data_rate=0.3,
            dtype="bfloat16",
        )
        base = finalize_config(base, data_root="/tmp/snag_bench_data")
        data = load_data(base)
        feats = prepare_features(base, data)
        stats = prepare_stats(feats, data.ent_w_img)
        graph = data.graph
        b = base.batch_size
        links = jnp.asarray(data.train_ill[:b].astype(np.int64))
        if links.shape[0] < b:
            links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
        valid = jnp.ones((b,), dtype=bool)
        key0 = jax.random.PRNGKey(7)

        losses = {}
        for routed in (True, False):
            C.ROUTE_SIMPLE_ICL = routed
            model = build_model(base, data)
            state = create_train_state(base, model, feats, graph,
                                       optax.sgd(1e-3), base.random_seed)
            noise_fn = make_noise_fn(base, stats)
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
                    return (tot * 1e-12, key), l
                (d, _), ls = jax.lax.scan(body, (jnp.float32(0.0), k0),
                                          jnp.arange(K))
                return d, ls[0]

            ms = chain_ms(run, state.params, nfeats, graph, links, valid,
                          key0)
            _, l0 = run(state.params, nfeats, graph, links, valid, key0)
            losses[routed] = float(l0)
            print(f"{model_name} routed={int(routed)}: model fwd+bwd "
                  f"{ms:8.2f} ms  (first-step loss {float(l0):.6f})")
        C.ROUTE_SIMPLE_ICL = True
        rel = abs(losses[True] - losses[False]) / max(abs(losses[False]),
                                                      1e-9)
        print(f"{model_name} loss rel diff routed-vs-dense: {rel:.2e}")


if __name__ == "__main__":
    main()
