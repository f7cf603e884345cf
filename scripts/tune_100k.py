"""Tile-structure tuning sweep at the 100K geometry (STATUS r3 gap #3).

The GAT kernels' tile structures auto-size from a degree quantile
(ops/pallas/tile_segment.build_tile_structure: cap_quantile=0.97,
hard_cap=16) — sized on the 330K-edge bench graph.  This sweeps those
knobs at 100K entities / ~1.1M edges and times the chained train step.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tune_100k.py
Env: TUNE_ENTS / TUNE_TRIPLES to shrink the geometry.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_all(cfg):
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import create_train_state, make_noise_fn, make_train_step
    import optax

    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    step = make_train_step(cfg, model, optax.sgd(1e-3), stats)
    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        links = jnp.tile(links, (-(-b // links.shape[0]), 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    return state, step, links, valid, nfeats, graph


def time_steps(state, step, links, valid, nfeats, graph,
               n_iter=int(os.environ.get("TUNE_ITERS", "10"))):
    @jax.jit
    def run(state, links, valid, nfeats, graph):
        def body(st, i):
            st, loss, _ = step(st, links, valid, nfeats, graph, i)
            return st, loss
        st, losses = jax.lax.scan(body, state, jnp.arange(n_iter))
        return st, losses[-1]

    st, loss = run(state, links, valid, nfeats, graph)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    st, loss = run(state, links, valid, nfeats, graph)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / n_iter * 1000


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    import snag_tpu.ops.pallas.tile_segment as tsg

    ents = int(os.environ.get("TUNE_ENTS", "100000"))
    triples = int(os.environ.get("TUNE_TRIPLES", "500000"))
    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=ents, synth_rels=2000, synth_triples=triples,
        synth_img_dim=2048, exp_name="tune100k", data_rate=0.3,
        dtype="bfloat16",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_100k_data")

    orig = tsg.build_tile_structure
    sweep = [(0.97, 16), (0.90, 16), (0.97, 8), (0.99, 24), (0.95, 12),
             (0.99, 32)]
    n_points = int(os.environ.get("TUNE_POINTS", str(len(sweep))))
    sweep = sweep[:n_points]
    for cq, hc in sweep:
        tsg.build_tile_structure = functools.partial(
            orig, cap_quantile=cq, hard_cap=hc)
        try:
            t0 = time.time()
            built = build_all(cfg)
            g = built[-1]
            ms = time_steps(*built)
            print(f"cap_quantile={cq} hard_cap={hc}: step {ms:7.2f} ms "
                  f"(rt {g.rt_n_tiles}x{g.rt_max_chunks} spill {g.rt_n_spill}, "
                  f"ct {g.ct_n_tiles}x{g.ct_max_chunks} spill {g.ct_n_spill}; "
                  f"build {time.time() - t0:.0f}s)")
        finally:
            tsg.build_tile_structure = orig


if __name__ == "__main__":
    main()
