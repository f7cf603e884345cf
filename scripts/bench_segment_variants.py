"""Race segment-reduce formulations at the GAT's real geometry
(E=330752 row-sorted edges, C=602, N=30000), varying inputs per call,
measured INSIDE a realistic consumer (the reduce output feeds an add so
XLA cannot collapse everything into one lucky fusion).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_segment_variants.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_vary(fn, mk_args, n=15):
    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*mk_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.ops.segment import (segment_reduce_sorted,
                                      sorted_block_segment_sum)

    cfg = Config(data_choice="SYNTH", model_name="SNAG", exp_name="segv",
                 synth_ents=30000, synth_rels=2000, synth_triples=150000,
                 synth_img_dim=64, random_seed=3408, data_rate=0.3)
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data_seg")
    data = load_data(cfg)
    g = data.graph
    e, n, c = g.row.shape[0], g.n_nodes, 602
    print(f"E={e} N={n} C={c} width={g.gather_width}")

    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (e, c), jnp.float32)
    base = jnp.where(jnp.asarray(g.mask)[:, None], base, 0.0)
    base16 = base.astype(jnp.bfloat16)
    row = jnp.asarray(g.row)
    starts = jnp.asarray(g.starts)
    deg = jnp.asarray(g.deg)
    tail_sel = jnp.asarray(g.tail_sel)
    tail_row = jnp.asarray(g.tail_row)
    W = g.gather_width

    probe = jax.random.normal(jax.random.PRNGKey(1), (n, c), jnp.float32)

    def consume(out):
        # force the reduce output to be a REAL (N, C) producer feeding an
        # elementwise consumer + a reduction (mimics the GAT's use)
        return ((out.astype(jnp.float32) + probe) ** 2).sum()

    # V1: current CSR packed take+sum
    @jax.jit
    def v1(vals, s):
        return consume(segment_reduce_sorted(vals + s, g))
    ms1 = timeit_vary(v1, lambda i: (base16, jnp.bfloat16(i * 1e-9)))

    # V2: XLA segment_sum f32
    @jax.jit
    def v2(vals, s):
        return consume(jax.ops.segment_sum(vals + s, row, num_segments=n,
                                           indices_are_sorted=True))
    ms2 = timeit_vary(v2, lambda i: (base, jnp.float32(i * 1e-9)))

    # V3: unrolled per-width accumulation (W gathers of (N, C))
    @jax.jit
    def v3(vals, s):
        v = vals + s
        pos_max = e - 1
        acc = jnp.zeros((n, c), jnp.float32)
        for j in range(W):
            idx = jnp.where(j < deg, starts + j, pos_max)
            acc = acc + v[idx].astype(jnp.float32)
        tail = jax.ops.segment_sum(v[tail_sel].astype(jnp.float32), tail_row,
                                   num_segments=n, indices_are_sorted=True)
        return consume(acc + tail)
    ms3 = timeit_vary(v3, lambda i: (base16, jnp.bfloat16(i * 1e-9)))

    # V4: one-hot MXU block scan
    @jax.jit
    def v4(vals, s):
        return consume(sorted_block_segment_sum(vals + s, row, n))
    ms4 = timeit_vary(v4, lambda i: (base16, jnp.bfloat16(i * 1e-9)))

    # V5: lax.scan over width (like V3 but rolled; less code dup)
    @jax.jit
    def v5(vals, s):
        v = vals + s
        pos_max = e - 1

        def body(acc, j):
            idx = jnp.where(j < deg, starts + j, pos_max)
            return acc + v[idx].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((n, c), jnp.float32),
                              jnp.arange(W))
        tail = jax.ops.segment_sum(v[tail_sel].astype(jnp.float32), tail_row,
                                   num_segments=n, indices_are_sorted=True)
        return consume(acc + tail)
    ms5 = timeit_vary(v5, lambda i: (base16, jnp.bfloat16(i * 1e-9)))

    print(f"V1 CSR packed take+sum:        {ms1:8.2f} ms")
    print(f"V2 XLA segment_sum f32:        {ms2:8.2f} ms")
    print(f"V3 unrolled W gathers:         {ms3:8.2f} ms")
    print(f"V4 one-hot MXU block scan:     {ms4:8.2f} ms")
    print(f"V5 scanned W gathers:          {ms5:8.2f} ms")

    # numeric agreement
    o1 = segment_reduce_sorted(base16, g).astype(jnp.float32)
    o2 = jax.ops.segment_sum(base, row, num_segments=n,
                             indices_are_sorted=True)
    print("V1 vs V2 max err:",
          float(jnp.abs(o1 - o2).max()))


if __name__ == "__main__":
    main()
