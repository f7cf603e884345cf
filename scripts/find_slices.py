"""Identify the big async dynamic-slice ops seen in the r4 trace
((30000,300) f32 -> (7504,300) x4, ~4.5 ms each): print their HLO
metadata/op_name so they can be attributed to a model stage.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/find_slices.py
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np


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
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    txt = step.lower(state, links, valid, nfeats, graph,
                     jnp.asarray(0)).compile().as_text()

    pat = re.compile(r"^[^\n]*f32\[75[01]\d,300\][^\n]*$", re.M)
    hits = pat.findall(txt)
    print(f"{len(hits)} lines mention f32[750x,300]")
    for h in hits[:30]:
        m = re.search(r"op_name=\"([^\"]*)\"", h)
        head = h.strip()[:150]
        print("-", head)
        print("   op_name:", m.group(1) if m else "(none)")


if __name__ == "__main__":
    main()
