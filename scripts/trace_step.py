"""Capture a jax.profiler device trace of the train step and print the
top ops by self time (parsed from the xplane protobuf).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_step.py
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/snag_trace"


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

    state, loss, _ = step(state, links, valid, nfeats, graph, jnp.asarray(0))
    jax.block_until_ready(loss)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            state, loss, _ = step(state, links, valid, nfeats, graph,
                                  jnp.asarray(i))
        jax.block_until_ready(loss)

    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    if not files:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[0], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name} ==")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(totals.values())
        print(f"total op-time: {tot/1e12*1000:.2f} ms (3 steps)")
        for name, ps in top:
            print(f"  {ps/1e12*1000/3:8.3f} ms/step  {name[:140]}")


if __name__ == "__main__":
    main()
