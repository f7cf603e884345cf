"""TPU check + A/B for the fused GAT backward kernel.

1. grads fused-vs-XLA-fallback at production scale;
2. chained model fwd+bwd timing with the fused backward on/off.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_gat_bwd_tpu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import snag_tpu.ops.gat_attn_primitive as gp
from snag_tpu.data.graph import build_graph
from snag_tpu.ops.gat_attn_primitive import gat_attention


def check_grads():
    rng = np.random.default_rng(0)
    n, c, h = 30000, 300, 2
    tri = [(int(rng.integers(n)), 0, int(rng.integers(n)))
           for _ in range(150000)]
    g = build_graph(n, tri)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    s_src = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    def loss(x, s_src, s_dst):
        agg, rs = gat_attention(x, s_src, s_dst, g)
        return (agg * wa).sum() * 1e-4 + (rs * wr).sum() * 1e-4

    def grads():
        return jax.block_until_ready(
            jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, s_src, s_dst))

    gp.FUSED_BWD = True
    got = grads()
    gp.FUSED_BWD = False
    want = grads()
    gp.FUSED_BWD = True
    for name, a, b in zip(("d_x", "d_s_src", "d_s_dst"), got, want):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-12
        print(f"{name}: max abs diff {np.abs(a - b).max():.3e} "
              f"(rel-to-max {np.abs(a - b).max() / scale:.3e})")
    return g, x, s_src, s_dst, wa, wr, loss


def time_model_step():
    import scripts.ab_fused as ab
    for fused, label in ((True, "fused-bwd "), (False, "xla-bwd   ")):
        gp.FUSED_BWD = fused
        print(f"--- {label} ---")
        ab.main()
    gp.FUSED_BWD = True


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    check_grads()
    time_model_step()
