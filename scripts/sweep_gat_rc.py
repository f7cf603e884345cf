"""Time the fused GAT attention primitive (fwd and fwd+bwd) at bench
geometry for the CURRENT SNAG_GAT_R / SNAG_GAT_CHUNK env setting.

R and CHUNK are read at import (ops/pallas/tile_segment.py), so a sweep
runs this script once per setting:

    for rc in "128 512" "256 512" "64 512" "128 768"; do
      set -- $rc
      SNAG_GAT_R=$1 SNAG_GAT_CHUNK=$2 \
        PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_gat_rc.py
    done

Chained K-iter timing (one dispatch, lax.scan) so tunnel dispatch latency
cannot pollute the per-iter number.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("AB_ITERS", "50"))


def main():
    from snag_tpu.ops.pallas import tile_segment as tsg
    from snag_tpu.data.graph import build_graph
    from snag_tpu.ops.gat_attn_primitive import gat_attention

    n, c, h = 30000, 300, 2
    rng = np.random.default_rng(0)
    tri = [(int(rng.integers(n)), 0, int(rng.integers(n)))
           for _ in range(150000)]
    g = build_graph(n, tri)
    print(f"R={tsg.R} CHUNK={tsg.CHUNK} e_pad={g.e_pad} "
          f"rt_tiles={g.rt_n_tiles} n_flat={g.rt_n_flat} "
          f"(real chunks ~{g.e_pad // tsg.CHUNK})")

    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    s_src = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    @jax.jit
    def fwd_chain(x, s_src, s_dst):
        def body(carry, _):
            agg, rs = gat_attention(carry, s_src, s_dst, g)
            # fold the output back so iterations are dependent
            nxt = carry + 1e-7 * agg[:, 0, :].astype(carry.dtype)
            return nxt, (agg * wa).sum() + (rs * wr).sum()
        return jax.lax.scan(body, x, None, length=K)

    def loss(x, s_src, s_dst):
        agg, rs = gat_attention(x, s_src, s_dst, g)
        return ((agg * wa).sum() * 1e-4 + (rs * wr).sum() * 1e-4)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def fwdbwd_chain(x, s_src, s_dst):
        def body(carry, _):
            gx, gs, gd = grad(carry, s_src, s_dst)
            return carry + gx.astype(carry.dtype) * 1e-7, gs.sum()
        return jax.lax.scan(body, x, None, length=K)

    for name, fn in (("fwd", fwd_chain), ("fwd+bwd", fwdbwd_chain)):
        out = fn(x, s_src, s_dst)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(x, s_src, s_dst)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / K * 1000
        print(f"  {name:8s} {ms:7.3f} ms/iter")


if __name__ == "__main__":
    main()
