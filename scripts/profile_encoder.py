"""Attribute encoder forward time: GAT vs projections vs Mformer fusion.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_encoder.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, **kw):
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

    print(f"edges={graph.row.shape[0]} gather_width={graph.gather_width} "
          f"col_gather_width={graph.col_gather_width} n_tail={graph.n_tail}")

    from snag_tpu.models.encoder import MultiModalEncoder
    enc = MultiModalEncoder(
        cfg=cfg, ent_num=data.ent_num, img_feature_dim=data.img_dim,
        attr_input_dim=int(data.att_features.shape[1]),
        char_feature_dim=data.char_dim, fusion_kind="mformer")
    eparams = params["multimodal_encoder"]

    # GAT only
    @jax.jit
    def gat_fwd(p, feats, graph):
        def run(mdl, f, g):
            return mdl.cross_graph_model(mdl.entity_emb, g)
        return enc.apply({"params": p}, feats, graph, method=run)

    ms_gat = timeit(gat_fwd, eparams, feats, graph)

    # projections only
    @jax.jit
    def proj_fwd(p, feats, graph):
        def run(mdl, f, g):
            return (mdl.img_fc(f.img).sum() + mdl.rel_fc(f.rel).sum()
                    + mdl.att_fc(f.att).sum())
        return enc.apply({"params": p}, feats, graph, method=run)

    ms_proj = timeit(proj_fwd, eparams, feats, graph)

    # fusion only (on precomputed modality embeddings)
    @jax.jit
    def modal_embs(p, feats, graph):
        def run(mdl, f, g):
            return mdl.modal_embeddings(f, g, None, True)
        return enc.apply({"params": p}, feats, graph, method=run)

    gph, img, rel, att, name, char = modal_embs(eparams, feats, graph)
    jax.block_until_ready(gph)

    @jax.jit
    def fusion_fwd(p, embs):
        def run(mdl, e):
            return mdl.fusion([e[0], e[1], e[2], e[3], None, None])[0].sum()
        return enc.apply({"params": p}, embs, method=run)

    ms_fus = timeit(fusion_fwd, eparams, (img, att, rel, gph))

    # full modal_embeddings (GAT + projections together)
    @jax.jit
    def modal_sum(p, feats, graph):
        out = enc.apply({"params": p}, feats, graph, None, True,
                        method=lambda m, f, g, k, d: m.modal_embeddings(f, g, k, d))
        return sum(o.sum() for o in out if o is not None)

    ms_modal = timeit(modal_sum, eparams, feats, graph)

    # GAT layers individually: layer 1 (input 300 wide, H=2) then layer 2
    print(f"GAT fwd only:            {ms_gat:8.2f} ms")
    print(f"projections fwd only:    {ms_proj:8.2f} ms")
    print(f"fusion fwd only:         {ms_fus:8.2f} ms")
    print(f"modal_embeddings fwd:    {ms_modal:8.2f} ms")

    # -- segment primitive microbench (same session, cached compile) ------
    from snag_tpu.ops.segment import segment_reduce_sorted
    e = graph.row.shape[0]
    for c in (602, 128):
        key = jax.random.PRNGKey(0)
        vals = jax.random.normal(key, (e, c), jnp.float32)
        vals = jnp.where(jnp.asarray(graph.mask)[:, None], vals, 0.0)
        csr = jax.jit(lambda v: segment_reduce_sorted(v, graph))
        seg = jax.jit(lambda v: jax.ops.segment_sum(
            v, jnp.asarray(graph.row), num_segments=graph.n_nodes,
            indices_are_sorted=True))
        ms_csr = timeit(csr, vals.astype(jnp.bfloat16))
        ms_seg = timeit(seg, vals)
        try:
            from snag_tpu.ops.pallas.segment_kernel import (
                pallas_available, sorted_segment_sum_pallas)
            if pallas_available():
                row = jnp.asarray(graph.row)
                pal = jax.jit(lambda v: sorted_segment_sum_pallas(
                    v, row, graph.n_nodes))
                ms_pal = timeit(pal, vals)
            else:
                ms_pal = float("nan")
        except Exception as ex:  # noqa: BLE001
            ms_pal = float("nan")
            print(f"pallas failed: {type(ex).__name__}: {ex}")
        print(f"segment C={c}: CSR(bf16) {ms_csr:.2f} ms | XLA f32 {ms_seg:.2f} ms"
              f" | Pallas f32 {ms_pal:.2f} ms")

    # gather microbench: edge col-gather of (N, 602) table
    from snag_tpu.ops.segment import edge_gather_col
    tbl = jax.random.normal(jax.random.PRNGKey(1), (graph.n_nodes, 602),
                            jnp.bfloat16)
    eg = jax.jit(lambda t: edge_gather_col(t, graph).sum())
    ms_eg = timeit(eg, tbl)
    print(f"edge col-gather (E,602) bf16: {ms_eg:.2f} ms")


if __name__ == "__main__":
    main()
