"""Calibrate effective HBM bandwidth + per-dispatch overhead on this chip.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_bandwidth.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_vary(fn, mk_args, n=20):
    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*mk_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    e, c = 330752, 602
    n = 30000
    x16 = jax.random.normal(jax.random.PRNGKey(0), (e, c), jnp.bfloat16)
    x32 = x16.astype(jnp.float32)
    nbytes16 = e * c * 2
    row = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (e,), 0, n))

    # 1. pure read reduction: sum(x + s) -> reads 0.4 GB
    @jax.jit
    def red(x, s):
        return (x + s).sum()
    ms = timeit_vary(red, lambda i: (x16, jnp.bfloat16(i)))
    print(f"read-reduce bf16 (0.40 GB read):        {ms:7.2f} ms "
          f"-> {nbytes16 / ms / 1e6:.0f} GB/s")

    # 2. elementwise copy: y = x + s -> read 0.4 + write 0.4 GB
    @jax.jit
    def ew(x, s):
        return x + s
    ms = timeit_vary(ew, lambda i: (x16, jnp.bfloat16(i)))
    print(f"elementwise bf16 (0.80 GB r+w):         {ms:7.2f} ms "
          f"-> {2 * nbytes16 / ms / 1e6:.0f} GB/s")

    # 3. f32 elementwise (1.6 GB r+w)
    @jax.jit
    def ew32(x, s):
        return x + s
    ms = timeit_vary(ew32, lambda i: (x32, jnp.float32(i)))
    print(f"elementwise f32 (1.60 GB r+w):          {ms:7.2f} ms "
          f"-> {4 * nbytes16 / ms / 1e6:.0f} GB/s")

    # 4. segment_sum alone (no producer pass)
    @jax.jit
    def seg(x, s):
        return jax.ops.segment_sum(x, row, num_segments=n,
                                   indices_are_sorted=True) + s
    ms = timeit_vary(seg, lambda i: (x32, jnp.float32(i)))
    print(f"segment_sum f32 alone (1.7 GB r+w):     {ms:7.2f} ms")

    # 5. tiny op: dispatch floor
    small = jnp.ones((8, 128), jnp.float32)
    @jax.jit
    def tiny(x, s):
        return (x + s).sum()
    ms = timeit_vary(tiny, lambda i: (small, jnp.float32(i)), n=50)
    print(f"tiny op (dispatch floor):               {ms:7.2f} ms")

    # 6. medium matmul for MXU calibration: (4096,4096)@(4096,4096) bf16
    a = jax.random.normal(jax.random.PRNGKey(2), (4096, 4096), jnp.bfloat16)
    @jax.jit
    def mm(a, s):
        return jnp.dot(a + s, a, preferred_element_type=jnp.float32).sum()
    ms = timeit_vary(mm, lambda i: (a, jnp.bfloat16(i)))
    fl = 2 * 4096 ** 3
    print(f"matmul 4096^3 bf16:                     {ms:7.2f} ms "
          f"-> {fl / ms / 1e9:.1f} TF/s")


if __name__ == "__main__":
    main()
