"""TPU validation of the fused Mformer layer: compiled-vs-eager numerics
at small scale, then the chained full-model profile at bench geometry.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_fused_tpu.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

K = 30


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.ops.fusion import BertLayer

    # ---- numeric: compiled kernel vs eager branch (deterministic) -----
    N, M, d, inter = 1000, 4, 300, 400
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, M, d)).astype(np.float32))
    eager = BertLayer(hidden_size=d, num_heads=1, intermediate_size=inter,
                      use_intermediate=True, fused=False)
    params = eager.init({"params": jax.random.PRNGKey(0)}, x,
                        deterministic=True)
    fused = BertLayer(hidden_size=d, num_heads=1, intermediate_size=inter,
                      use_intermediate=True, fused=True)

    def loss(mod):
        @jax.jit
        def f(p, x):
            out, probs = mod.apply(p, x, deterministic=True)
            return (out ** 2).sum() + (probs ** 3).sum()
        return f

    v1, g1 = jax.value_and_grad(loss(eager))(params, x)
    v2, g2 = jax.value_and_grad(loss(fused))(params, x)
    print(f"loss eager {float(v1):.4f} fused {float(v2):.4f}")
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2)
    print("max grad err:", max(jax.tree_util.tree_leaves(errs)))

    # training-mode smoke (in-kernel PRNG)
    @jax.jit
    def ftrain(p, x, k):
        out, probs = fused.apply(p, x, deterministic=False,
                                 rngs={"dropout": k})
        return (out ** 2).sum()
    v, g = jax.value_and_grad(ftrain)(params, x, jax.random.PRNGKey(7))
    leaves_ok = all(bool(jnp.isfinite(l).all())
                    for l in jax.tree_util.tree_leaves(g))
    print(f"training mode: loss {float(v):.2f} grads finite: {leaves_ok}")


if __name__ == "__main__":
    main()
