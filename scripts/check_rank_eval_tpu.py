"""TPU check + timing for the streaming rank-eval kernels.

Correctness vs the dense XLA evaluator at 4K pairs, then timing at the
bench geometry (10.5K pairs, d=1200, CSLS k=3) as ONE chained dispatch
with perturbed inputs per repeat (axon tunnel timing rules).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_rank_eval_tpu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import snag_tpu.ops.pallas.rank_eval as rk
from snag_tpu.eval.ranking import _eval_core


def _embs(n, d, seed=0):
    rng = np.random.default_rng(seed)
    l = rng.normal(size=(n, d)).astype(np.float32)
    r = l + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    return jnp.asarray(l), jnp.asarray(r)


def check(n=4000, d=300):
    emb_l, emb_r = _embs(n, d)
    for use_csls in (False, True):
        got_l2r, got_r2l, got3 = jax.block_until_ready(
            rk.streaming_rank_eval(emb_l, emb_r, 3, use_csls, True))
        _, want_l2r, want_r2l, want3 = jax.block_until_ready(
            _eval_core(emb_l, emb_r, 3, use_csls, 2, True))
        for tag, a, b in (("l2r", got_l2r, want_l2r),
                          ("r2l", got_r2l, want_r2l),
                          ("top3", got3, want3)):
            a, b = np.asarray(a), np.asarray(b)
            bad = (a != b).sum()
            print(f"csls={use_csls} {tag}: mismatches {bad}/{a.size}")


def timing(n=10500, d=1200, k=20):
    emb_l, emb_r = _embs(n, d, seed=1)

    def one(which):
        @jax.jit
        def run(emb_l, emb_r):
            def body(carry, i):
                el = emb_l + carry * 1e-9
                if which == "stream":
                    ra, rb, _ = rk.streaming_rank_eval(el, emb_r, 3, True,
                                                       False)
                else:
                    _, ra, rb, _ = _eval_core(el, emb_r, 3, True, 2, False)
                return (ra.sum() + rb.sum()).astype(jnp.float32) * 1e-9, None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return out
        out = run(emb_l, emb_r)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(run(emb_l, emb_r))
        return (time.perf_counter() - t0) / k * 1000

    print(f"full-rank eval {n}x{n} d={d} CSLS k=3, both directions:")
    print(f"  stream {one('stream'):8.2f} ms")
    print(f"  dense  {one('dense'):8.2f} ms")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    check()
    timing()
