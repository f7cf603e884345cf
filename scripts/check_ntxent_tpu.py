"""TPU check + A/B for the streaming NT-Xent kernels.

1. value/grad agreement streaming-vs-dense at production-like shapes;
2. chained timing of the loss block alone (fwd+bwd), both paths;
3. chained timing of the full model step, both paths.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_ntxent_tpu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def chain_ms(jitted, *args, k=K):
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / k * 1000


def check_numerics():
    import snag_tpu.ops.pallas.ntxent_kernel as nk
    from snag_tpu.losses.contrastive import _icl_xent_batched

    rng = np.random.default_rng(0)
    m, b, d = 4, 3500, 300
    emb = rng.normal(size=(m, 2 * b, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=2, keepdims=True)
    zis = jnp.asarray(emb[:, :b]).astype(jnp.bfloat16)
    zjs = jnp.asarray(emb[:, b:]).astype(jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.2, 1, size=(m, b)).astype(np.float32))
    valid = jnp.asarray(np.arange(b) < b - 37)

    def run(zis, zjs, w):
        return _icl_xent_batched(zis, zjs, w, valid, 0.1, 0.5).sum()

    # NOTE: the dispatch flag is read at TRACE time — a fresh jax.jit
    # wrapper per setting, or the second call reuses the first executable
    nk.DISABLE = False
    v_s, g_s = jax.block_until_ready(
        jax.jit(jax.value_and_grad(run, argnums=(0, 1, 2)))(zis, zjs, w))
    nk.DISABLE = True
    v_d, g_d = jax.block_until_ready(
        jax.jit(jax.value_and_grad(run, argnums=(0, 1, 2)))(zis, zjs, w))
    nk.DISABLE = False
    print(f"value: streaming {float(v_s):.6f} dense {float(v_d):.6f} "
          f"rel {abs(float(v_s - v_d)) / abs(float(v_d)):.2e}")
    for name, a, bb in zip(("d_zis", "d_zjs", "d_w"), g_s, g_d):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        denom = np.abs(bb).max() + 1e-12
        print(f"grad {name}: max abs diff {np.abs(a - bb).max():.3e} "
              f"(rel-to-max {np.abs(a - bb).max() / denom:.3e})")


def time_loss_block():
    import snag_tpu.ops.pallas.ntxent_kernel as nk
    from snag_tpu.losses.contrastive import _icl_xent_batched

    rng = np.random.default_rng(1)
    b = 3500
    for m, d, tag in ((2, 1200, "GMI"), (4, 300, "ECIA/IIR")):
        emb = rng.normal(size=(m, 2 * b, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=2, keepdims=True)
        zis = jnp.asarray(emb[:, :b]).astype(jnp.bfloat16)
        zjs = jnp.asarray(emb[:, b:]).astype(jnp.bfloat16)
        valid = jnp.ones((b,), bool)

        def loss(zis, zjs):
            return _icl_xent_batched(zis, zjs, None, valid, 0.1, 0.5).sum()

        def make_run():
            @jax.jit
            def run(zis, zjs):
                def body(carry, i):
                    dz = jax.grad(loss)(zis + carry * 1e-9, zjs)
                    return dz.sum() * 1e-12, None
                out, _ = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(K))
                return out
            return run

        for disable, label in ((False, "stream"), (True, "dense ")):
            nk.DISABLE = disable
            ms = chain_ms(make_run(), zis, zjs)
            print(f"{tag} (M={m}, d={d}): {label} fwd+bwd {ms:7.2f} ms")
        nk.DISABLE = False


def time_full_step():
    import dataclasses
    import snag_tpu.ops.pallas.ntxent_kernel as nk
    from scripts.ab_fused import chain_ms as _unused  # noqa: F401
    # reuse the ab_fused harness wholesale, flipping nk.DISABLE
    import scripts.ab_fused as ab

    real_main = ab.main

    for disable, label in ((False, "stream"), (True, "dense ")):
        nk.DISABLE = disable
        print(f"--- full step, loss={label} ---")
        real_main()
    nk.DISABLE = False


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    check_numerics()
    time_loss_block()
