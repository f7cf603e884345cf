"""Streaming SNAG loss bundle: ECIA + GMI from shared modality similarities.

SNAG's loss reads the batch similarities three ways (reference
SNAG.py:101-122, SNAG_loss.py:58-128):

* ECIA — one NT-Xent per modality over K_m = z_m z_m^T;
* GMI  — NT-Xent over BOTH joint paths, whose similarities FACTOR over
  the same blocks: the joint embedding is a weighted concat of the unit
  modality rows (SNAG_tools.py:44-49), so

      S_att(i,j) = sum_m a[i,m] a[j,m] K_m(i,j),   a = w / ||w||_2
      S_fz(i,j)  = sum_m beta_m K_m(i,j),          beta = u^2 / ||u||_2^2

  (w = per-entity attention weights, u = softmax(weight_raw)).

The dense path pays for GMI with two (2B, 2B, M*d) matmul chains.  These
kernels instead compute each K_m ONCE per column tile and derive all
M + 2 channels from it — the GMI matmuls disappear entirely, and nothing
quadratic touches HBM (same flash-style structure as ntxent_kernel.py:
static max via |S| <= 1/tau, symmetric-S backward folding G and G^T into
one block visit).

Channel layout everywhere: [modality 0..M-1 | mix-att | mix-fz], padded
to 8 sublanes.  Consumed via losses/contrastive.snag_bundle_losses.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from snag_tpu.ops.pallas.tile_segment import pallas_available, _round_up

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _IMPORTED = True
except Exception:  # pragma: no cover
    _IMPORTED = False

# Tests force interpret-mode execution on CPU by flipping this.
FORCE_INTERPRET = False
# A/B harnesses force the dense fallback on TPU by flipping this.
DISABLE = False

_EPS = 1e-30
RT_F = 512     # forward row/col PADDING granularity (max tile)
RT_B = 256     # backward max tile (carries the (M, RT, RT) K scratch)
C_PAD = 8      # channel axis padded to sublane count

# Scoped-VMEM budget for tile selection.  The v5e scoped limit is 16 MiB;
# the original fixed RT_F=512 was tuned on bf16 inputs and overflows it in
# f32 at d=300 (hit by the 15K-entity f32 parity co-run, 2026-08-19).
# Calibration: at (m=4, rt=512, d=300, f32) the double-buffered-window
# estimate below gives 10.9 MiB while Mosaic's actual scoped accounting
# reported 21.21 MiB (~1.95x — kernel-body temporaries and lane padding
# are not in the window model), so the cap is 8 MiB: est <= 8M keeps the
# true footprint under the 16M limit with the measured ratio.  bf16 keeps
# the original (TPU-validated) tile sizes at every shipped geometry.
_VMEM_CAP = 8 * 2 ** 20


def _pick_rt(m: int, d: int, itemsize: int, max_rt: int,
             dz_out: bool = False) -> int:
    """Largest row/col tile whose z blocks (+ backward extras) fit the cap.

    Counted: row+col z blocks double-buffered, alpha/coef tiles, and for
    the backward the f32 dz output block and the (M, rt, rt) K scratch."""
    rt = max_rt
    while rt > 128:
        est = 2 * 2 * m * rt * d * itemsize + 2 * 2 * rt * 128 * 4
        if dz_out:
            est += 2 * m * rt * d * 4 + m * rt * rt * itemsize
        if est <= _VMEM_CAP:
            break
        rt //= 2
    return rt


def streaming_ok(m: int, b: int, d: int) -> bool:
    if DISABLE or m > 6:
        return False
    if FORCE_INTERPRET and _IMPORTED:
        return True
    return _IMPORTED and pallas_available()


def _stack_z(zis, zjs, valid):
    """(M,B,d) pair + (B,) mask -> z (M,2Bp,d), vcol (1,2Bp) f32, Bp."""
    m, b, d = zis.shape
    bp = _round_up(b, RT_F)

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((m, bp - b, d), x.dtype)], axis=1)

    z = jnp.concatenate([pad(zis), pad(zjs)], axis=1)
    v = (jnp.ones((b,), jnp.float32) if valid is None
         else valid.astype(jnp.float32))
    vp = jnp.concatenate([v, jnp.zeros((bp - b,), jnp.float32)])
    return z, jnp.concatenate([vp, vp]).reshape(1, 2 * bp), bp


def _lane_onehot(m: int, val, dtype=jnp.float32):
    """(1, 128) with ``val`` in lane m (Mosaic-friendly scalar scatter)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.where(lanes == m, val, 0.0).astype(dtype)


def _mix_lse_kernel(z_row_ref, z_col_ref, a_row_ref, a_col_ref, beta_ref,
                    vcol_ref, out_ref, acc_ref, *, n_mod: int, bp: int,
                    rt: int, inv_tau: float):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rows = i * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = j * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    mask = (rows != cols).astype(jnp.float32) * vcol_ref[0][None, :]

    mix_a = jnp.zeros((rt, rt), jnp.float32)
    mix_f = jnp.zeros((rt, rt), jnp.float32)
    for m in range(n_mod):
        k = jax.lax.dot_general(
            z_row_ref[m], z_col_ref[m],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (RT, CT)
        acc_ref[m:m + 1, :] += jnp.sum(
            jnp.exp(k * inv_tau - inv_tau) * mask, axis=1)[None, :]
        mix_a += (a_row_ref[:, m][:, None] * a_col_ref[:, m][None, :]) * k
        mix_f += beta_ref[0, m] * k
    # |mix| <= 1: Cauchy-Schwarz on the unit coefficient vectors
    acc_ref[n_mod:n_mod + 1, :] += jnp.sum(
        jnp.exp(mix_a * inv_tau - inv_tau) * mask, axis=1)[None, :]
    acc_ref[n_mod + 1:n_mod + 2, :] += jnp.sum(
        jnp.exp(mix_f * inv_tau - inv_tau) * mask, axis=1)[None, :]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = jnp.log(acc_ref[...] + _EPS) + inv_tau


def _w_channel(s, lse_r, lse_c, coef_r, coef_c, vr, vc, neq, onehot,
               inv_tau):
    """Combined G + G^T weight block for one channel (see ntxent_kernel):
    s already scaled by inv_tau; the returned w includes the inv_tau
    factor of dS/d(input)."""
    p_row = jnp.exp(jnp.minimum(s - lse_r, 0.0))
    p_col = jnp.exp(jnp.minimum(s - lse_c, 0.0))
    return (neq * (coef_r * p_row * vc + p_col * coef_c * vr)
            - onehot * (coef_r + coef_c)) * inv_tau


def _mix_grad_kernel(z_row_ref, z_col_ref, a_row_ref, a_col_ref, beta_ref,
                     lse_r_ref, lse_c_ref, coef_r_ref, coef_c_ref,
                     vrow_ref, vcol_ref, dz_ref, da_ref, db_ref, k_ref, *,
                     n_mod: int, bp: int, rt: int, inv_tau: float):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dz_ref[...] = jnp.zeros_like(dz_ref)
        da_ref[...] = jnp.zeros_like(da_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    rows = i * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    cols = j * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    neq = (rows != cols).astype(jnp.float32)
    pos = jnp.where(rows < bp, rows + bp, rows - bp)
    onehot = (cols == pos).astype(jnp.float32)
    vr = vrow_ref[0][:, None]
    vc = vcol_ref[0][None, :]

    mix_a = jnp.zeros((rt, rt), jnp.float32)
    mix_f = jnp.zeros((rt, rt), jnp.float32)
    for m in range(n_mod):
        k = jax.lax.dot_general(
            z_row_ref[m], z_col_ref[m],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        k_ref[m] = k.astype(k_ref.dtype)
        mix_a += (a_row_ref[:, m][:, None] * a_col_ref[:, m][None, :]) * k
        mix_f += beta_ref[0, m] * k

    def ch(c, s):
        return _w_channel(
            s, lse_r_ref[c, :][:, None], lse_c_ref[c, :][None, :],
            coef_r_ref[c, :][:, None], coef_c_ref[c, :][None, :],
            vr, vc, neq, onehot, inv_tau)

    w_a = ch(n_mod, mix_a * inv_tau)
    w_f = ch(n_mod + 1, mix_f * inv_tau)

    da_add = jnp.zeros((rt, 128), jnp.float32)
    db_add = jnp.zeros((C_PAD, 128), jnp.float32)
    for m in range(n_mod):
        k = k_ref[m].astype(jnp.float32)
        w_m = ch(m, k * inv_tau)
        wk_a = w_a * k
        w_tot = (w_m
                 + w_a * (a_row_ref[:, m][:, None] * a_col_ref[:, m][None, :])
                 + w_f * beta_ref[0, m])
        dz_ref[m] += jax.lax.dot_general(
            w_tot.astype(z_col_ref.dtype), z_col_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (RT, d)
        # dL/da[r,m] = sum_c w_a[r,c] * a[c,m] * K_m[r,c]  (w_a has inv_tau)
        da_m = jnp.sum(wk_a * a_col_ref[:, m][None, :], axis=1)
        da_add += da_m[:, None] * _lane_onehot(m, 1.0)
        # dL/dbeta_m = sum_rc G_f[r,c] * K_m[r,c]; w_f = G_f + G_f^T and K
        # is symmetric, so the folded sum double-counts -> halve.  (da_m
        # above needs NO halving: alpha[r,m] appears in row r AND column r
        # of S, and the fold supplies exactly those two terms.)
        db_add += jnp.concatenate(
            [_lane_onehot(m, 0.5 * jnp.sum(w_f * k)),
             jnp.zeros((C_PAD - 1, 128), jnp.float32)], axis=0)
    da_ref[...] += da_add
    db_ref[...] += db_add


def mixture_lse(z: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                vcol: jnp.ndarray, n_mod: int, tau: float) -> jnp.ndarray:
    """z (M, 2Bp, d); alpha (2Bp, 128) lanes 0..M-1; beta (1, 128);
    vcol (1, 2Bp).  Returns lse (C_PAD, 2Bp) f32 per channel."""
    m, bp2, d = z.shape
    bp = bp2 // 2
    rt = _pick_rt(m, d, z.dtype.itemsize, RT_F)
    n_rc = bp2 // rt

    return pl.pallas_call(
        functools.partial(_mix_lse_kernel, n_mod=n_mod, bp=bp, rt=rt,
                          inv_tau=1.0 / tau),
        grid=(n_rc, n_rc),
        in_specs=[
            pl.BlockSpec((m, rt, d), lambda i, j: (0, i, 0)),
            pl.BlockSpec((m, rt, d), lambda i, j: (0, j, 0)),
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((1, rt), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((C_PAD, rt), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C_PAD, bp2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C_PAD, rt), jnp.float32)],
        interpret=FORCE_INTERPRET,
    )(z, z, alpha, alpha, beta, vcol)


def mixture_grad(z, alpha, beta, lse, coef, vcol, n_mod: int, tau: float
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward over all channels.  lse/coef: (C_PAD, 2Bp) f32 (coef rows
    already folded with cotangent, direction weight, per-row weights and
    1/denom).  Returns (dz (M, 2Bp, d) f32, dalpha (2Bp, 128) f32,
    dbeta (C_PAD, 128) f32 — row 0, lanes 0..M-1)."""
    m, bp2, d = z.shape
    bp = bp2 // 2
    rt = _pick_rt(m, d, z.dtype.itemsize, RT_B, dz_out=True)
    n_rc = bp2 // rt

    dz, da, db = pl.pallas_call(
        functools.partial(_mix_grad_kernel, n_mod=n_mod, bp=bp, rt=rt,
                          inv_tau=1.0 / tau),
        grid=(n_rc, n_rc),
        in_specs=[
            pl.BlockSpec((m, rt, d), lambda i, j: (0, i, 0)),
            pl.BlockSpec((m, rt, d), lambda i, j: (0, j, 0)),
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((C_PAD, rt), lambda i, j: (0, i)),
            pl.BlockSpec((C_PAD, rt), lambda i, j: (0, j)),
            pl.BlockSpec((C_PAD, rt), lambda i, j: (0, i)),
            pl.BlockSpec((C_PAD, rt), lambda i, j: (0, j)),
            pl.BlockSpec((1, rt), lambda i, j: (0, i)),
            pl.BlockSpec((1, rt), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((m, rt, d), lambda i, j: (0, i, 0)),
            pl.BlockSpec((rt, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((C_PAD, 128), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, bp2, d), jnp.float32),
            jax.ShapeDtypeStruct((bp2, 128), jnp.float32),
            jax.ShapeDtypeStruct((C_PAD, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((m, rt, rt), z.dtype)],
        interpret=FORCE_INTERPRET,
    )(z, z, alpha, alpha, beta, lse, lse, coef, coef, vcol, vcol)
    return dz, da, db
