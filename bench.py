"""Benchmark harness — prints ONE JSON line for the driver.

Measures the SNAG MMEA hot path at DBP15K scale on a synthetic KG
(15K entities per side, 2048-d visual features, batch 3500 — the
run_snag.sh geometry): jitted full-graph train-step throughput, plus
full-rank eval latency as a secondary field.

vs_baseline: measured epoch-time ratio vs. the PyTorch reference executed
on THIS machine's CPU at the identical geometry (scripts/run_reference_cpu.py
on the dataset exported by snag_tpu/data/export_reference.py — see
BASELINE.md "Measured" section).  No reference GPU exists here; BASELINE.md
also records the literature-scale GPU estimate for context.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Minted on 2026-08-16: reference SNAG, 30K ents / 150K triples / batch 3500,
# torch-2.13 CPU via scripts/run_reference_cpu.py — steady-state epochs
# 252/235/246 s (BASELINE.md).  Metric-parity anchor on the same files:
# reference MRR 0.997 vs snag_tpu 0.996 (2K-entity export, seed 3408).
REFERENCE_CPU_EPOCH_MS = 245_000.0
# single-GPU torch implementations of this family report ~1-2 s/epoch on
# DBP15K-class data (BASELINE.md context); kept as a reference point only
REFERENCE_GPU_EPOCH_MS_EST = 1_500.0


def _apply_fallback(stage: int):
    """Disable Pallas fast paths one at a time (bench must produce a number
    even if a kernel fails to compile on the driver's chip — every fallback
    is an XLA formulation of the same math and is reported in the JSON)."""
    import snag_tpu.ops.gat_attn_primitive as gap
    from snag_tpu.ops.pallas import (ntxent_kernel, rank_eval,
                                     snag_loss_kernel, tile_segment)
    if stage >= 1:
        snag_loss_kernel.DISABLE = True
    if stage >= 2:
        ntxent_kernel.DISABLE = True
    if stage >= 3:
        gap.FUSED_BWD = False
    if stage >= 4:
        rank_eval.DISABLE = True
        tile_segment._PALLAS_IMPORTED = False  # master off-switch


_FALLBACK_NAMES = {0: None, 1: "snag_loss_kernel_off", 2: "+ntxent_off",
                   3: "+fused_gat_bwd_off", 4: "+all_pallas_off"}


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    # persistent XLA cache (same default as the CLIs): bench reruns skip
    # the 1-5 min tunnel compile of the big step
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SNAG_COMPILE_CACHE",
                                     "/tmp/snag_tpu_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from snag_tpu.config import Config, finalize_config

    # DBP15K-shaped synthetic workload (run_snag.sh geometry)
    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=30000, synth_rels=2000, synth_triples=150000,
        synth_img_dim=2048, exp_name="bench", data_rate=0.3,
        dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")

    import sys
    mmea = None
    for stage in range(5):
        try:
            _apply_fallback(stage)
            mmea = _bench_mmea(cfg)
            break
        except Exception as e:  # noqa: BLE001 — survive, report, degrade
            print(f"bench: MMEA stage {stage} failed: {e!r}", file=sys.stderr)
    if mmea is None:
        raise SystemExit("bench: all MMEA fallback stages failed")
    mmea["fallback"] = _FALLBACK_NAMES[stage]

    # MKGC triples/sec/chip + filtered-LP eval latency at DB15K geometry
    # (the BASELINE.json headline pair); measured at BOTH the throughput
    # geometry (num_batch=64) and the reference readme's canonical contract
    # (NUM_BATCH=1024, MARGIN=12 — SNAG_MKGC/readme.md:38-48)
    mkgc_tps = mkgc_eval_ms = mkgc_tps_canon = None
    mkgc_fallback = "failed"
    for mk_stage in dict.fromkeys((stage, 4)):   # dedup keeps order
        try:
            _apply_fallback(mk_stage)
            mkgc_tps, mkgc_eval_ms = _bench_mkgc(num_batch=64, margin=1.0)
            mkgc_tps_canon, _ = _bench_mkgc(num_batch=1024, margin=12.0,
                                            skip_eval=True)
            mkgc_fallback = _FALLBACK_NAMES[mk_stage]
            break
        except Exception as e:  # noqa: BLE001
            print(f"bench: MKGC stage {mk_stage} failed: {e!r}",
                  file=sys.stderr)

    # Reference epoch = ceil(4500/3500) = 2 steps on DBP15K with data_rate
    # 0.3; report step throughput as the headline.
    steps_per_sec = mmea["steps_per_sec"]
    epoch_ms = mmea["epoch_ms"]
    print(json.dumps({
        "metric": "snag_mmea_train_steps_per_sec_dbp15k_scale",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(REFERENCE_CPU_EPOCH_MS / epoch_ms, 1),
        "extra": {
            "step_ms": round(1000 / steps_per_sec, 2),
            "epoch_ms": round(epoch_ms, 2),
            "full_rank_eval_ms": round(mmea["eval_ms"], 2),
            "full_rank_eval_device_ms": mmea["eval_dev_ms"],
            "vs_baseline_denominator": "torch-CPU reference epoch, measured"
                                       " (BASELINE.md); no reference GPU in"
                                       " this environment",
            "vs_est_gpu_epoch": round(REFERENCE_GPU_EPOCH_MS_EST / epoch_ms, 2),
            "n_entities": cfg.synth_ents,
            "batch_size": cfg.batch_size,
            "dtype": cfg.dtype,
            "fallback": mmea["fallback"],
            "mkgc_triples_per_sec": mkgc_tps,
            "mkgc_triples_per_sec_canonical": mkgc_tps_canon,
            "mkgc_filtered_eval_ms": mkgc_eval_ms,
            "mkgc_fallback": mkgc_fallback,
            "device": str(jax.devices()[0]),
        },
    }))


def _bench_mmea(cfg):
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.optim import build_optimizer
    from snag_tpu.train.step import (create_train_state, make_embed_fn,
                                     make_noise_fn, make_train_step)
    from snag_tpu.eval.ranking import full_rank_eval

    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    model = build_model(cfg, data)

    import optax
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    tx, _ = build_optimizer(cfg, state.params, total_steps=1000,
                            warmup_steps=100)
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

    # warmup / compile
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    state, loss, _ = step(state, links, valid, nfeats, graph, jnp.asarray(0))
    jax.block_until_ready(loss)

    # sustained step throughput measured as a K-step lax.scan chain inside
    # ONE dispatch: per-dispatch overheads and host->device scalar
    # transfers through the axon tunnel otherwise distort the number by
    # 10-40% (see memory: axon-timing-artifacts); the scan chain is what a
    # production epoch driver executes anyway.
    n_iter = 30

    @jax.jit
    def run_steps(state, links, valid, nfeats, graph):
        def body(st, i):
            st, loss, _ = step(st, links, valid, nfeats, graph, i)
            return st, loss
        st, losses = jax.lax.scan(body, state, jnp.arange(n_iter))
        return st, losses[-1]

    state, loss = run_steps(state, links, valid, nfeats, graph)  # compile
    jax.block_until_ready(loss)
    # median of 3 scan readings: a single 30-step scan through the tunnel
    # draws +-5% run-to-run, enough to mask (or fake) a cross-round
    # regression (VERDICT r4 weak #2)
    scan_s = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = run_steps(state, links, valid, nfeats, graph)
        jax.block_until_ready(loss)
        scan_s.append(time.perf_counter() - t0)
    dt = sorted(scan_s)[1]
    steps_per_sec = n_iter / dt

    # per-epoch noise cost, same pipelined measurement
    t0 = time.perf_counter()
    for e in range(10):
        nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(e))
    jax.block_until_ready(nfeats.img)
    noise_ms = (time.perf_counter() - t0) / 10 * 1000
    # DBP15K epoch = 1 noise + ceil(4500/3500)=2 steps
    epoch_ms = noise_ms + 2 * 1000 / steps_per_sec

    # full-rank eval latency (10.5K x 10.5K, the DBP15K test-split size)
    embed = make_embed_fn(cfg, model)
    joint, _ = embed(state.params, feats, graph)
    joint = joint / jnp.linalg.norm(joint, axis=1, keepdims=True)
    n_test = min(10500, len(data.test_ill))
    tl = jnp.asarray(data.test_ill[:n_test, 0].astype(np.int64))
    tr = jnp.asarray(data.test_ill[:n_test, 1].astype(np.int64))
    # measure with a perturbed input per repeat — identical-args repeat
    # dispatches through the axon tunnel give invalid timings (memory:
    # axon-timing-artifacts).  The perturbed copies are materialized
    # BEFORE the timed loop: the eager gather+add ops cost ~1s/rep through
    # the tunnel and polluted the round-2 reading (259 vs 88 ms).
    n_rep = 3
    el, er = joint[tl], joint[tr]
    perturb = jax.jit(lambda e, c: e + c)
    els = [jax.block_until_ready(perturb(el, jnp.float32(i * 1e-7)))
           for i in range(n_rep + 1)]
    from snag_tpu.ops.pallas.rank_eval import rank_eval_ok, \
        streaming_rank_eval
    if rank_eval_ok():
        # the production eval path (runner.evaluate fast path): ranks +
        # metric reduction in ONE dispatch, ~40-byte readback
        from snag_tpu.eval.ranking import metrics_from_ranks_device

        @jax.jit
        def eval_fused(el, er):
            rl, rr, _ = streaming_rank_eval(el, er, 3, True, False)
            return metrics_from_ranks_device(rl, rr)

        np.asarray(eval_fused(els[0], er))  # compile
        t0 = time.perf_counter()
        for i in range(1, n_rep + 1):
            np.asarray(eval_fused(els[i], er))
        eval_ms = (time.perf_counter() - t0) * 1000 / n_rep
    else:
        full_rank_eval(els[0], er, use_csls=True, csls_k=3)  # compile
        t0 = time.perf_counter()
        for i in range(1, n_rep + 1):
            full_rank_eval(els[i], er, use_csls=True, csls_k=3)
        eval_ms = (time.perf_counter() - t0) * 1000 / n_rep

    # device-side eval latency: marginal cost of one more eval inside one
    # dispatch.  A K-iteration lax.scan chain (the r3/r4 method) reads
    # ~27 ms/iter at this geometry while a single synced dispatch costs
    # ~43.5 ms and TWO dependent evals in one dispatch cost exactly 2x one
    # (measured 2026-08-20: 43.5 / 87.3) — i.e. the scan number is
    # amortized back-to-back THROUGHPUT (cross-iteration pipelining /
    # hoisting), not the latency an IL-protocol eval actually pays.  So:
    # eval_dev_ms = (wall of K dependent evals - wall of 1) / (K - 1),
    # which cancels dispatch + readback and cannot pipeline across
    # dispatches.  np.asarray is the sync — block_until_ready does not
    # reliably block through the axon tunnel (memory: axon-timing).
    eval_dev_ms = None
    if rank_eval_ok():
        from snag_tpu.eval.ranking import metrics_from_ranks_device
        k_rep = 3

        @jax.jit
        def eval_multi(el, er):
            ms = []
            for i in range(k_rep):
                rl, rr, _ = streaming_rank_eval(el, er, 3, True, False)
                ms.append(metrics_from_ranks_device(rl, rr))
                el = el + ms[-1][0] * 1e-12     # serialize the repeats
            return ms

        def timed(fn, arg):
            jax.tree_util.tree_map(np.asarray, fn(arg, er))  # compile
            ts = []
            for i in range(3):
                a = jax.block_until_ready(perturb(arg, jnp.float32(i * 1e-7)))
                t0 = time.perf_counter()
                jax.tree_util.tree_map(np.asarray, fn(a, er))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1] * 1000

        w1 = timed(eval_fused, els[0])
        wk = timed(eval_multi, els[0])
        eval_dev_ms = round((wk - w1) / (k_rep - 1), 2)

    return {"steps_per_sec": steps_per_sec, "epoch_ms": epoch_ms,
            "eval_ms": eval_ms, "eval_dev_ms": eval_dev_ms}


def _bench_mkgc(num_batch=64, margin=1.0, skip_eval=False):
    """MKGC margin-ranking throughput + filtered link-prediction eval
    latency at DB15K geometry (~12.8K entities, emb 128, neg 32)."""
    from snag_tpu.mkgc.config import MKGCConfig
    from snag_tpu.mkgc.data import load_mkgc_data
    from snag_tpu.mkgc.train import MKGCRunner
    from snag_tpu.utils.logging import create_logger

    cfg = MKGCConfig(data_choice="SYNTH", emb_dim=128, num_batch=num_batch,
                     neg_num=32, margin=margin, joint_way="Mformer_hd_graph",
                     num_proj=2, add_noise=1, noise_ratio=0.2, mask_ratio=0.7,
                     use_pool=1, pool_dim=256, num_hidden_layers=1,
                     num_attention_heads=2, synth_ents=12800, synth_rels=256,
                     synth_triples=90000, synth_vis_dim=4096,
                     synth_txt_dim=768, random_seed=7, log_every=10**9)
    runner = MKGCRunner(cfg, create_logger(name="bench_mkgc"))
    runner.train_epoch(0)  # compile + first epoch
    t0 = time.perf_counter()
    n_epochs = 3
    for e in range(1, 1 + n_epochs):
        runner.train_epoch(e)
    dt = time.perf_counter() - t0
    triples = (len(runner.data.train) // runner.batch_size) * runner.batch_size
    tps = round(n_epochs * triples / dt, 1)
    if skip_eval:
        return tps, None

    # filtered full-entity ranking over the valid split (both directions);
    # median of 5 — single-shot readings through the tunnel spread up to
    # 2.4x run-to-run (48 vs 114 ms observed r3, ADVICE item 1)
    runner.evaluate("valid")                      # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        runner.evaluate("valid")
        times.append((time.perf_counter() - t0) * 1000)
    eval_ms = round(sorted(times)[len(times) // 2], 1)
    return tps, eval_ms


if __name__ == "__main__":
    main()
