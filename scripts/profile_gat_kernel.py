"""TPU validation + chained timing of the tile-segment GAT kernel.

1. numeric check pallas-vs-XLA on the bench graph;
2. chained per-iter timing of the aggregation fwd and fwd+bwd.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_gat_kernel.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def chain_ms(jitted, *args):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000


def main():
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.ops.pallas import tile_segment as tsg
    from snag_tpu.ops.gat_agg import gat_aggregate

    cfg = Config(data_choice="SYNTH", model_name="SNAG", exp_name="gatk",
                 synth_ents=30000, synth_rels=2000, synth_triples=150000,
                 synth_img_dim=64, random_seed=3408, data_rate=0.3)
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data_seg")
    data = load_data(cfg)
    g = data.graph
    n, c, h = g.n_nodes, 300, 2
    print(f"E={g.e_pad} N={n} rt_tiles={g.rt_n_tiles} "
          f"rt_maxc={g.rt_max_chunks} rt_spill={g.rt_n_spill} "
          f"ct_maxc={g.ct_max_chunks} ct_spill={g.ct_n_spill}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    e = jnp.where(jnp.asarray(g.mask)[:, None],
                  jnp.asarray(rng.uniform(0.1, 2.0,
                                          size=(g.e_pad, h)).astype(np.float32)),
                  0.0)

    # -- numeric check (f32 path) --------------------------------------
    @jax.jit
    def pallas_out(x, e, g):
        return gat_aggregate(x, e, g)

    @jax.jit
    def xla_out(x, e, g):
        xc = x[g.col]
        return tsg.xla_weighted_segment_sum(xc, e, g.row, g.n_nodes)

    a1, r1 = pallas_out(x, e, g)
    a2, r2 = xla_out(x, e, g)
    err_a = float(jnp.abs(a1 - a2).max())
    err_r = float(jnp.abs(r1 - r2).max())
    scale = float(jnp.abs(a2).max())
    print(f"agg max err {err_a:.3e} (scale {scale:.2f}), rowsum {err_r:.3e}")

    # -- chained timing: fwd -------------------------------------------
    xb = x.astype(jnp.bfloat16)
    eb = e.astype(jnp.bfloat16)

    @jax.jit
    def fwd_chain(x0, e0, g):
        def body(carry, i):
            d = carry
            agg, rs = gat_aggregate(x0 + d, e0, g)
            return (agg.sum() * 1e-12).astype(x0.dtype), None
        d, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), jnp.arange(K))
        return d

    ms_f = chain_ms(fwd_chain, xb, eb, g)

    # -- chained timing: fwd + bwd -------------------------------------
    @jax.jit
    def fb_chain(x0, e0, g):
        def body(carry, i):
            d = carry
            def f(xx, ee):
                agg, rs = gat_aggregate(xx, ee, g)
                return agg.sum() + rs.sum()
            gx, ge = jax.grad(f, argnums=(0, 1))(x0 + d, e0)
            return (gx.sum() * 1e-12).astype(x0.dtype), None
        d, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), jnp.arange(K))
        return d

    ms_fb = chain_ms(fb_chain, xb, eb, g)

    print(f"gat_aggregate fwd:      {ms_f:8.2f} ms/iter")
    print(f"gat_aggregate fwd+bwd:  {ms_fb:8.2f} ms/iter")


if __name__ == "__main__":
    main()
