"""Tie-breaker profiling: same computations measured with VARYING inputs
(an epoch scalar folded into a cheap input perturbation) so any
dispatch-level result caching cannot fake the timing; plus the full
encoder measured both through SNAG.joint_emb and directly.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_encoder2.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_vary(fn, mk_args, n=20):
    """fn(*mk_args(i)) with a different scalar each call; one final sync."""
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
    from snag_tpu.models.encoder import (MultiModalEncoder, prepare_features,
                                         prepare_stats)
    from snag_tpu.train.step import create_train_state
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
    graph = data.graph
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    params = state.params
    eparams = params["multimodal_encoder"]
    enc = MultiModalEncoder(
        cfg=cfg, ent_num=data.ent_num, img_feature_dim=data.img_dim,
        attr_input_dim=int(data.att_features.shape[1]),
        char_feature_dim=data.char_dim, fusion_kind="mformer")

    # scalar "i" perturbs the entity_emb param cheaply -> fresh buffers/call
    def perturb(p, s):
        q = dict(p)
        q["entity_emb"] = p["entity_emb"] + s
        return q

    # 1. full encoder via SNAG.joint_emb
    @jax.jit
    def full_snag(params, feats, graph, s):
        p = dict(params)
        p["multimodal_encoder"] = perturb(params["multimodal_encoder"], s)
        out = model.apply({"params": p}, feats, graph,
                          method=type(model).joint_emb)
        return out[0].sum()

    ms1 = timeit_vary(full_snag,
                      lambda i: (params, feats, graph, jnp.float32(i * 1e-9)))

    # 2. full encoder direct
    @jax.jit
    def full_direct(eparams, feats, graph, s):
        out = enc.apply({"params": perturb(eparams, s)}, feats, graph,
                        None, True)
        return out.joint_fz.sum()

    ms2 = timeit_vary(full_direct,
                      lambda i: (eparams, feats, graph, jnp.float32(i * 1e-9)))

    # 3. GAT only, varying
    @jax.jit
    def gat_only(eparams, feats, graph, s):
        out = enc.apply(
            {"params": perturb(eparams, s)}, feats, graph,
            method=lambda m, f, g: m.cross_graph_model(m.entity_emb, g))
        return out.sum()

    ms3 = timeit_vary(gat_only,
                      lambda i: (eparams, feats, graph, jnp.float32(i * 1e-9)))

    # 4. projections only, varying (perturb img table on device? too big --
    #    perturb the kernel instead)
    @jax.jit
    def proj_only(eparams, feats, s):
        p = dict(eparams)
        ik = dict(p["img_fc"])
        ik["kernel"] = ik["kernel"] + s
        p["img_fc"] = ik
        def run(m, f):
            return (m.img_fc(f.img).sum() + m.rel_fc(f.rel).sum()
                    + m.att_fc(f.att).sum())
        return enc.apply({"params": p}, feats, method=run)

    ms4 = timeit_vary(proj_only,
                      lambda i: (eparams, feats, jnp.float32(i * 1e-9)))

    # 5. fusion only, varying input embeddings
    @jax.jit
    def modal_out(eparams, feats, graph):
        return enc.apply(
            {"params": eparams}, feats, graph,
            method=lambda m, f, g: m.modal_embeddings(f, g, None, True))

    embs = modal_out(eparams, feats, graph)
    jax.block_until_ready(embs[0])
    gph, img, rel, att, _, _ = embs

    @jax.jit
    def fusion_only(eparams, img, att, rel, gph, s):
        def run(m, a, b, c, d):
            out = m.fusion([a + s, b, c, d, None, None])
            return out[0].sum() + out[1].sum() + out[2].sum()
        return enc.apply({"params": eparams}, img, att, rel, gph, method=run)

    ms5 = timeit_vary(fusion_only,
                      lambda i: (eparams, img, att, rel, gph,
                                 jnp.float32(i * 1e-9)))

    print(f"1 full encoder (SNAG.joint_emb):  {ms1:8.2f} ms")
    print(f"2 full encoder (direct):          {ms2:8.2f} ms")
    print(f"3 GAT only:                       {ms3:8.2f} ms")
    print(f"4 projections only:               {ms4:8.2f} ms")
    print(f"5 fusion only:                    {ms5:8.2f} ms")


if __name__ == "__main__":
    main()
