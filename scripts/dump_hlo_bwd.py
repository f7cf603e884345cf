"""Cost-analyze the encoder fwd+bwd program; find the backward hotspots.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/dump_hlo_bwd.py
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
    key = jax.random.PRNGKey(0)

    def enc_fb(params, feats, graph, k):
        def f(p):
            enc = model.apply(
                {"params": p}, feats, graph, k, False, rngs={"dropout": k},
                method=lambda m, f_, g, kk, d: m.multimodal_encoder(
                    f_, g, entity_noise_key=kk, deterministic=d))
            return (enc.joint.sum() + enc.joint_fz.sum() + enc.hidden.sum()
                    + enc.weight_norm.sum())
        g = jax.grad(f)(params)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    compiled = jax.jit(enc_fb).lower(params, feats, graph, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("== cost analysis ==")
    for k in sorted(ca):
        v = ca[k]
        if isinstance(v, float) and v > 1e8:
            print(f"  {k}: {v:.3e}")
    txt = compiled.as_text()
    big = []
    for m in re.finditer(r"(\w+)\[([\d,]+)\]", txt):
        dims = [int(x) for x in m.group(2).split(",") if x]
        nel = int(np.prod(dims)) if dims else 0
        if nel >= 100_000_000:
            big.append((nel, m.group(0)))
    print("== tensors >= 100M elems ==")
    for nel, s in sorted(set(big), reverse=True)[:25]:
        print(f"  {nel:>12}  {s}")
    for kw in ("sort", "while", " scatter", "rng-bit", "custom-call",
               "convolution", "gather("):
        print(f"count {kw.strip()}: {len(re.findall(kw, txt))}")
    with open("/tmp/hlo_bwd.txt", "w") as f:
        f.write(txt)
    print("full HLO -> /tmp/hlo_bwd.txt")


if __name__ == "__main__":
    main()
