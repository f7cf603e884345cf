"""A/B the MKGC train-throughput suspects (VERDICT r3 weak item 1).

r2 measured 355K triples/s at num_batch=64; r3 measured 296K.  Changes in
between that touch the MKGC step: the tiny-attn broadcast rewrite + QKV
fold in ops/fusion.py (shared BertLayer) and the all-entity-fusion gather
branch in mkgc/model.py.  This script measures each toggle in-process with
fresh jits (identical harness = comparable numbers; cross-process bench
spread through the tunnel is ~±10%).

Usage: python scripts/ab_mkgc.py [--num_batch 64] [--epochs 3]
"""

import argparse
import json
import time


def bench_variant(name, num_batch, n_epochs, tiny, fold, all_ent):
    import jax
    from snag_tpu.ops import fusion
    from snag_tpu.mkgc import model as mkgc_model
    from snag_tpu.mkgc.config import MKGCConfig
    from snag_tpu.mkgc.train import MKGCRunner
    from snag_tpu.utils.logging import create_logger

    fusion.TINY_ATTN_IMPL = tiny
    fusion.FOLD_QKV = fold
    mkgc_model.ALL_ENT_FUSION = all_ent

    cfg = MKGCConfig(data_choice="SYNTH", emb_dim=128, num_batch=num_batch,
                     neg_num=32, margin=1.0, joint_way="Mformer_hd_graph",
                     num_proj=2, add_noise=1, noise_ratio=0.2, mask_ratio=0.7,
                     use_pool=1, pool_dim=256, num_hidden_layers=1,
                     num_attention_heads=2, synth_ents=12800, synth_rels=256,
                     synth_triples=90000, synth_vis_dim=4096,
                     synth_txt_dim=768, random_seed=7, log_every=10**9)
    runner = MKGCRunner(cfg, create_logger(name=f"ab_{name}"))
    runner.train_epoch(0)   # compile
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        for e in range(1, 1 + n_epochs):
            runner.train_epoch(e)
        dt = time.perf_counter() - t0
        triples = (len(runner.data.train) // runner.batch_size) * runner.batch_size
        best = max(best, n_epochs * triples / dt)
    print(json.dumps({"variant": name, "tiny_attn": tiny, "fold_qkv": fold,
                      "all_ent_fusion": all_ent,
                      "triples_per_sec": round(best, 1)}), flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_batch", type=int, default=64)
    p.add_argument("--epochs", type=int, default=3)
    a = p.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/tmp/snag_tpu_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variants = [
        ("r3_defaults", "broadcast", True, "auto"),
        ("no_all_ent", "broadcast", True, "off"),
        ("unrolled_attn", "unrolled", True, "auto"),
        ("no_fold", "broadcast", False, "auto"),
        ("r2_equiv", "unrolled", False, "auto"),
        ("r2_equiv_no_all_ent", "unrolled", False, "off"),
    ]
    for name, tiny, fold, all_ent in variants:
        bench_variant(name, a.num_batch, a.epochs, tiny, fold, all_ent)


if __name__ == "__main__":
    main()
