"""Decide ops/pallas/segment_kernel.py's fate (VERDICT r1 item 9):
benchmark the Pallas sorted-segment-sum against the CSR packed-gather path
on the real TPU at the bench geometry (E edges x C=602 cols).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_segment_pallas.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.ops.segment import segment_reduce_sorted
    from snag_tpu.ops.pallas.segment_kernel import (pallas_available,
                                                    sorted_segment_sum_pallas)

    cfg = Config(data_choice="SYNTH", model_name="SNAG", exp_name="segbench",
                 synth_ents=30000, synth_rels=2000, synth_triples=150000,
                 synth_img_dim=64, random_seed=3408, data_rate=0.3)
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data_seg")
    data = load_data(cfg)
    graph = data.graph
    e = graph.row.shape[0]
    print(f"edges={e} nodes={graph.n_nodes} gather_width={graph.gather_width}")

    for c in (602, 128):
        key = jax.random.PRNGKey(0)
        vals = jax.random.normal(key, (e, c), jnp.float32)
        vals = jnp.where(jnp.asarray(graph.mask)[:, None], vals, 0.0)
        vals_bf = vals.astype(jnp.bfloat16)

        csr = jax.jit(lambda v: segment_reduce_sorted(v, graph))
        seg = jax.jit(lambda v: jax.ops.segment_sum(
            v, jnp.asarray(graph.row), num_segments=graph.n_nodes,
            indices_are_sorted=True))
        ms_csr = timeit(csr, vals_bf)
        ms_seg = timeit(seg, vals)
        row = jnp.asarray(graph.row)
        if pallas_available():
            pal = jax.jit(lambda v: sorted_segment_sum_pallas(
                v, row, graph.n_nodes))
            try:
                ms_pal = timeit(pal, vals)
            except Exception as ex:  # noqa: BLE001
                ms_pal = float("nan")
                print(f"pallas failed: {type(ex).__name__}: {ex}")
        else:
            ms_pal = float("nan")
        print(f"C={c}: CSR packed-gather {ms_csr:.2f} ms | "
              f"XLA segment_sum {ms_seg:.2f} ms | Pallas {ms_pal:.2f} ms")


if __name__ == "__main__":
    main()
