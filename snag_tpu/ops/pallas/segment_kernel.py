"""Pallas TPU kernel: segment-sum over row-sorted edges, scatter-free.

The GNN aggregation `out[r] = sum_{e: row[e]==r} vals[e]` is the profiled
bottleneck of the whole training step (XLA lowers segment_sum to a scatter,
which serializes per update: ~25-40 ms per pass at DBP15K scale).  This
kernel reformulates the reduction as MXU work inside ONE kernel launch:

* edges are consumed in blocks of ``BK``; every node owns a self-loop, so a
  sorted block's rows span < BK consecutive values and ``row - block_base``
  is a local index in [0, BK);
* each block reduces to a (BK, C) partial via a one-hot matmul (MXU);
* a VMEM carry holds the running window [base_i, base_i + BK); after adding
  the block partial, the full window is DMA'd to HBM at the block's base
  offset (later blocks overwrite the overlap with more complete sums — the
  final value of every row comes from the last window containing it), and
  the carry slides forward by base_{i+1} - base_i.

No scatters, no reads of the output, no zero-initialisation: windows cover
[0, N) and each row's last write is its complete sum.

Backward is pure gather (grad_vals[e] = g[row[e]]) via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

BK = 512           # edges per block; VMEM budget ~4 MB at C=640
W = BK + 8         # output window rows: block bases are rounded down to the
                   # 8-sublane boundary (HBM tiling), widening the span


def pallas_available() -> bool:
    if not _PALLAS_IMPORTED:
        return False
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon") or "tpu" in plat


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_kernel(bases_ref, local_ref, vals_ref, out_ref, acc_ref, sem):
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    base = pl.multiple_of(bases_ref[i], 8)   # 8-aligned (HBM tiling)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # one-hot(local) ^T @ vals on the MXU; local in [0, W)
    local = local_ref[...]                                   # (BK, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (BK, W), 1)
    oh = (local == cols).astype(jnp.bfloat16)                # (BK, W)
    part = jax.lax.dot_general(
        oh, vals_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),          # contract edge k
        preferred_element_type=jnp.float32)                  # (W, C)

    acc_ref[pl.ds(0, W), :] = acc_ref[pl.ds(0, W), :] + part

    dma = pltpu.make_async_copy(
        acc_ref.at[pl.ds(0, W), :],
        out_ref.at[pl.ds(base, W), :],
        sem)
    dma.start()
    dma.wait()

    # slide the carry window; bases are 8-aligned so the shift is a multiple
    # of 8 (vector-load alignment), asserted via pl.multiple_of
    idx2 = jnp.minimum(i + 1, n_blk - 1)
    shift = jnp.where(i + 1 < n_blk, bases_ref[idx2] - base,
                      jnp.int32(BK))
    shift = pl.multiple_of(shift, 8)
    nxt = acc_ref[pl.ds(shift, W), :]        # rows >= W are always zero
    acc_ref[pl.ds(0, W), :] = nxt
    acc_ref[pl.ds(W, BK), :] = jnp.zeros((BK, nxt.shape[1]), jnp.float32)


def _forward(vals: jnp.ndarray, row: jnp.ndarray, bases: jnp.ndarray,
             n_rows: int) -> jnp.ndarray:
    e, c = vals.shape
    n_blk = e // BK
    local = (row - jnp.repeat(bases, BK)).astype(jnp.int32).reshape(e, 1)

    out = pl.pallas_call(
        _seg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((BK, 1), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, c), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((W + BK, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_round_up(n_rows + W, 8), c),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases.astype(jnp.int32), local, vals.astype(jnp.float32))
    return out[:n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sorted_segment_sum(vals, row, bases, n_rows):
    return _forward(vals, row, bases, n_rows)


def _fwd(vals, row, bases, n_rows):
    return _forward(vals, row, bases, n_rows), (row,)


def _bwd(n_rows, res, g):
    (row,) = res
    return g[row], None, None


_sorted_segment_sum.defvjp(_fwd, _bwd)


def sorted_segment_sum_pallas(values: jnp.ndarray, row: jnp.ndarray,
                              n_rows: int) -> jnp.ndarray:
    """Drop-in for segment_sum(values, row, n_rows, indices_are_sorted=True)
    when ``row`` is sorted and covers every node (self-loop invariant).

    Pads the edge axis to BK and the feature axis to the 128-lane boundary.
    """
    e, c = values.shape
    e_pad = _round_up(e, BK)
    c_pad = _round_up(c, 128)
    if e_pad != e or c_pad != c:
        values = jnp.pad(values, ((0, e_pad - e), (0, c_pad - c)))
        row = jnp.pad(row, (0, e_pad - e), mode="edge")
    bases = (row[::BK] // 8) * 8        # 8-aligned window starts
    out = _sorted_segment_sum(values, row, bases, n_rows)
    return out[:, :c] if c_pad != c else out
