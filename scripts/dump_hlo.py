"""Dump optimized HLO of the all-outputs eval-mode encoder; look for the
pathological op (suspect: producer duplication or a padded batched matmul).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/dump_hlo.py
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    import optax
    from snag_tpu.train.step import create_train_state

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

    def enc_all(params, feats, graph):
        enc = model.apply(
            {"params": params}, feats, graph, None, True,
            method=lambda m, f, g, k, d: m.multimodal_encoder(
                f, g, entity_noise_key=k, deterministic=d))
        return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                + enc.weight_norm.sum())

    lowered = jax.jit(enc_all).lower(params, feats, graph)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print("== cost analysis ==")
        for k in sorted(ca):
            v = ca[k]
            if isinstance(v, float) and v > 1e6:
                print(f"  {k}: {v:.3e}")
    except Exception as e:
        print(f"cost_analysis failed: {e}")

    txt = compiled.as_text()
    print(f"== HLO length: {len(txt)} lines: {txt.count(chr(10))} ==")
    # ops with giant shapes or suspicious kinds
    pat = re.compile(r"^\s*(\S+) = (\S+?) (\S+)\(", re.M)
    big = []
    for m in re.finditer(r"(\w+)\[([\d,]+)\]", txt):
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = int(np.prod(dims)) if dims else 0
        if n >= 200_000_000:
            big.append((n, m.group(0)))
    big = sorted(set(big), reverse=True)[:20]
    print("== tensors >= 200M elems ==")
    for n, s in big:
        print(f"  {n:>12}  {s}")
    for kw in ("sort", "while", "scatter", "rng", "all-to-all", "convolution"):
        cnt = len(re.findall(rf"\b{kw}", txt))
        print(f"count {kw}: {cnt}")
    # dump the 30 longest lines (usually the mega-fusions)
    lines = txt.splitlines()
    lines_sorted = sorted(lines, key=len, reverse=True)[:15]
    with open("/tmp/hlo_encoder.txt", "w") as f:
        f.write(txt)
    print("full HLO -> /tmp/hlo_encoder.txt")
    # grep dots with big operand shapes
    print("== dot ops ==")
    for ln in lines:
        if " dot(" in ln or " custom-call" in ln:
            ln = ln.strip()
            print(" ", ln[:220])


if __name__ == "__main__":
    main()
