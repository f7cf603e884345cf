"""Alignment losses: ICL (NT-Xent), IAL (KL), NCA.

Pure functions over (N, d) embedding tables and (B, 2) link batches.  Each
mirrors a reference loss exactly, with one framework addition: an optional
``valid`` mask so capacity-padded batches (the fixed-shape IL pipeline)
compute the same value the reference gets with its ragged final batch —
invalid rows drop out of the numerator and denominator and their columns are
excluded from the negative pool.

References:
* icl_loss — SNAG_MMEA/model/SNAG_loss.py:31-128 (incl. w_min weighting);
  replay negatives variant MEAformer_loss.py:28-161.
* ial_loss — SNAG_loss.py:130-202.
* nca_loss — EVA_tools.py:80-148.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops.fusion import l2norm

LARGE_NUM = 1e9

# Route simple icl_loss calls (no replay/inversion) through the batched
# custom-VJP core (M=1) — streaming kernel on TPU, small residuals
# everywhere.  Module flag for in-process A/B (scripts/ab_family_loss.py).
ROUTE_SIMPLE_ICL = True


# ---------------------------------------------------------------------------
# Streaming batched NT-Xent core.
#
# The autodiff formulation materializes the concatenated (M, B, 2B) logits
# (and keeps them as residuals), which XLA stages through chunked while
# loops at ~40 ms/step at DBP15K scale.  This custom-VJP computes the same
# value from the three similarity blocks with a block-wise logsumexp and
# REBUILDS the similarity in the backward pass (one extra batched einsum,
# MXU-cheap) — so the only residuals are the (M, B) row statistics.
# ---------------------------------------------------------------------------

def _icl_blocks(zis, zjs, tau, valid):
    b = zis.shape[1]
    z = jnp.concatenate([zis, zjs], axis=1)                     # (M, 2B, d)
    big = jnp.einsum("mbd,mcd->mbc", z, z,
                     preferred_element_type=jnp.float32) / tau
    eye = jnp.eye(b, dtype=jnp.float32)
    ab = big[:, :b, b:]
    aa = big[:, :b, :b] - eye * LARGE_NUM
    bb = big[:, b:, b:] - eye * LARGE_NUM
    if valid is not None:
        # mask BOTH axes: the ab block is read row-wise by the a-direction
        # and column-wise by the b-direction, so invalid pairs must vanish
        # from the negative pool along either axis (the row mask only
        # perturbs invalid rows, whose losses are zeroed by the vf factor)
        colmask = jnp.where(valid[None, None, :], 0.0, -LARGE_NUM)
        rowmask = jnp.where(valid[None, :, None], 0.0, -LARGE_NUM)
        ab = ab + colmask + rowmask
        aa = aa + colmask + rowmask
        bb = bb + colmask + rowmask
    return ab, aa, bb


def _use_streaming(zis) -> bool:
    """Static dispatch to the flash-style Pallas path (TPU, or interpret
    mode under test); the dense block formulation is the fallback."""
    from snag_tpu.ops.pallas import ntxent_kernel as nk
    m, b, d = zis.shape
    return nk.streaming_ok(b, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _icl_xent_batched(zis, zjs, w_min, valid, tau, ab_weight):
    """(M,) NT-Xent losses over M modality batches; see module comment."""
    return _icl_xb_fwd(zis, zjs, w_min, valid, tau, ab_weight)[0]


def _per_row(zis, zjs, tau, valid):
    """Row losses (lse - diag) for both directions, transpose-free: the
    b-side reads ab COLUMN-wise (axis-1 reduces) instead of materializing
    ab^T — the (M, 2B, 2B) similarity transpose copy cost ~2.4 ms/step."""
    ab, aa, bb = _icl_blocks(zis, zjs, tau, valid)
    b = ab.shape[1]
    diag = ab[:, jnp.arange(b), jnp.arange(b)]

    m_a = jnp.maximum(ab.max(axis=2), aa.max(axis=2))           # (M, B)
    s_a = (jnp.exp(ab - m_a[:, :, None]).sum(axis=2)
           + jnp.exp(aa - m_a[:, :, None]).sum(axis=2))
    lse_a = jnp.log(s_a) + m_a

    m_b = jnp.maximum(ab.max(axis=1), bb.max(axis=2))           # (M, B)
    s_b = (jnp.exp(ab - m_b[:, None, :]).sum(axis=1)
           + jnp.exp(bb - m_b[:, :, None]).sum(axis=2))
    lse_b = jnp.log(s_b) + m_b
    return (lse_a - diag), (lse_b - diag)                       # (M, B) each


def _pos_diag(zis, zjs, tau):
    """Positive-pair similarities: pos[m, i] = zis_i . zjs_i / tau."""
    return jnp.einsum("mbd,mbd->mb", zis, zjs,
                      preferred_element_type=jnp.float32) / tau


def _icl_xb_fwd(zis, zjs, w_min, valid, tau, ab_weight):
    if _use_streaming(zis):
        from snag_tpu.ops.pallas.ntxent_kernel import streaming_lse
        lse_a, lse_b = streaming_lse(zis, zjs, tau, valid)
        pos = _pos_diag(zis, zjs, tau)
        # invalid rows get a finite per-row value here (the dense path's
        # is ~1e9); both are zeroed by the vf factor below
        per_a, per_b = lse_a - pos, lse_b - pos
    else:
        per_a, per_b = _per_row(zis, zjs, tau, valid)
    if valid is not None:
        vf = valid.astype(jnp.float32)
        denom = jnp.maximum(vf.sum(), 1.0)
    else:
        vf = jnp.ones((zis.shape[1],), jnp.float32)
        denom = jnp.float32(zis.shape[1])
    w = vf[None, :] if w_min is None else w_min * vf[None, :]
    loss = (ab_weight * (per_a * w).sum(axis=1)
            + (1 - ab_weight) * (per_b * w).sum(axis=1)) / denom
    return loss, (zis, zjs, w_min, valid, per_a, per_b, vf, denom)


def _icl_xb_bwd(tau, ab_weight, res, g):
    zis, zjs, w_min, valid, per_a, per_b, vf, denom = res
    m, b, _ = zis.shape

    if _use_streaming(zis):
        from snag_tpu.ops.pallas.ntxent_kernel import streaming_ntxent_grad
        pos = _pos_diag(zis, zjs, tau)
        w = vf[None, :] if w_min is None else w_min * vf[None, :]
        ca = (g[:, None] * ab_weight) * w / denom                # (M, B)
        cb = (g[:, None] * (1 - ab_weight)) * w / denom
        d_zis, d_zjs = streaming_ntxent_grad(
            zis, zjs, per_a + pos, per_b + pos, ca, cb, tau, valid)
        if w_min is None:
            d_w = None
        else:
            base = (ab_weight * per_a + (1 - ab_weight) * per_b) * vf[None, :]
            d_w = g[:, None] * base / denom
        d_valid = (None if valid is None
                   else np.zeros(valid.shape, dtype=jax.dtypes.float0))
        return (d_zis.astype(zis.dtype), d_zjs.astype(zjs.dtype), d_w,
                d_valid)

    ab, aa, bb = _icl_blocks(zis, zjs, tau, valid)   # recomputed, not stored
    diag = ab[:, jnp.arange(b), jnp.arange(b)]
    lse_a = per_a + diag
    lse_b = per_b + diag

    w = vf[None, :] if w_min is None else w_min * vf[None, :]
    ca = (g[:, None] * ab_weight) * w / denom                    # (M, B)
    cb = (g[:, None] * (1 - ab_weight)) * w / denom

    eye = jnp.eye(b, dtype=jnp.float32)
    # softmax over the virtual concat, per block; the b-direction reads ab
    # column-wise so no (M, B, B) transposes are materialized
    p_row = jnp.exp(ab - lse_a[:, :, None])                      # a-side rows
    p_col = jnp.exp(ab - lse_b[:, None, :])                      # b-side cols
    p_aa = jnp.exp(aa - lse_a[:, :, None])
    p_bb = jnp.exp(bb - lse_b[:, :, None])

    # combined gradient wrt the single stored ab block:
    # a-side rows contribute ca_i (p_row - I); b-side columns cb_j (p_col - I)
    g_ab = (ca[:, :, None] * (p_row - eye)
            + cb[:, None, :] * (p_col - eye))                    # (M, B, B)
    g_aa = ca[:, :, None] * p_aa
    g_bb = cb[:, :, None] * p_bb

    md = zis.dtype
    def bmm(spec, a, x):
        return jnp.einsum(spec, a.astype(md), x,
                          preferred_element_type=jnp.float32)

    # symmetric intra terms and the ab^T contraction are expressed through
    # einsum index order — XLA contracts without explicit transpose copies
    d_zis = (bmm("mbc,mcd->mbd", g_ab, zjs)
             + bmm("mbc,mcd->mbd", g_aa, zis)
             + bmm("mcb,mcd->mbd", g_aa, zis)) / tau
    d_zjs = (bmm("mcb,mcd->mbd", g_ab, zis)
             + bmm("mbc,mcd->mbd", g_bb, zjs)
             + bmm("mcb,mcd->mbd", g_bb, zjs)) / tau

    if w_min is None:
        d_w = None
    else:
        base = (ab_weight * per_a + (1 - ab_weight) * per_b) * vf[None, :]
        d_w = g[:, None] * base / denom
    d_valid = (None if valid is None
               else np.zeros(valid.shape, dtype=jax.dtypes.float0))
    return (d_zis.astype(zis.dtype), d_zjs.astype(zjs.dtype), d_w, d_valid)


_icl_xent_batched.defvjp(_icl_xb_fwd, _icl_xb_bwd)


def _masked_mean_xent(logits: jnp.ndarray, valid: Optional[jnp.ndarray],
                      w_min: Optional[jnp.ndarray]) -> jnp.ndarray:
    """softXEnt with diagonal targets: mean over rows of -logprob[i, i]
    (SNAG_loss.py:42-54)."""
    logprobs = jax.nn.log_softmax(logits, axis=1)
    b = logits.shape[0]
    diag = jnp.diagonal(logprobs)[:b]
    per_row = -diag
    if w_min is not None:
        per_row = per_row * w_min
    if valid is None:
        return per_row.mean()
    per_row = jnp.where(valid, per_row, 0.0)
    return per_row.sum() / jnp.maximum(valid.sum(), 1)


def icl_loss(
    emb: jnp.ndarray,
    links: jnp.ndarray,
    tau: float = 0.1,
    ab_weight: float = 0.5,
    weight_norm: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    neg_l: Optional[jnp.ndarray] = None,
    neg_r: Optional[jnp.ndarray] = None,
    neg_valid: Optional[jnp.ndarray] = None,
    neg_valid_r: Optional[jnp.ndarray] = None,
    norm: bool = True,
    with_replay_mining: bool = False,
    matmul_dtype=None,
    inversion: bool = False,
    neg_cross_kg: bool = False,
):
    """Intra-modal NT-Xent over a link batch (SNAG_loss.py:58-128).

    logits rows: [cross-KG ab | masked intra aa | optional replay negatives];
    labels are the diagonal of the ab block.  Returns the scalar loss, or
    (loss, l_neg_idx, r_neg_idx) when ``with_replay_mining`` (the MEAformer
    hardest-in-batch negative miner, MEAformer_loss.py:40-68).

    ``inversion`` swaps the intra block to the *opposite* KG —
    [ab | bb] / [ba | aa] — and, as in the reference branch, drops the
    replay-negative blocks (SNAG_loss.py:115-121).  ``neg_cross_kg`` is
    accepted for contract parity but inert: the reference stores it and
    never reads it (its only use is a commented-out branch,
    MEAformer_loss.py:50).
    """
    del neg_cross_kg  # reference dead flag (see docstring)
    if norm:
        emb = l2norm(emb)
    zis = emb[links[:, 0]]
    zjs = emb[links[:, 1]]
    b = zis.shape[0]
    if matmul_dtype is not None:
        # normalized rows (|x| <= 1): bf16 similarity matmuls with f32
        # accumulation are the production fast path
        zis = zis.astype(matmul_dtype)
        zjs = zjs.astype(matmul_dtype)

    w_min = None
    if weight_norm is not None:
        zis_w = weight_norm[links[:, 0]]
        zjs_w = weight_norm[links[:, 1]]
        w_min = jnp.minimum(zis_w, zjs_w)

    if (ROUTE_SIMPLE_ICL and neg_l is None and not inversion
            and not with_replay_mining):
        # simple contract (no replay negatives / mining / inversion):
        # identical math through the batched custom-VJP core with M=1 —
        # residuals are (1, B) row stats instead of the (B, 2B) logits,
        # and on TPU the flash-style streaming kernel applies.  This is
        # the MEAformer/MCLEA joint-loss production path (VERDICT r3 #8).
        return _icl_xent_batched(zis[None], zjs[None],
                                 None if w_min is None else w_min[None],
                                 valid, tau, ab_weight)[0]

    eye = jnp.eye(b, dtype=jnp.float32)
    def sim(x, y):
        return jnp.dot(x, y.T, preferred_element_type=jnp.float32) / tau
    # one (2B, 2B) matmul yields all three similarity blocks
    z = jnp.concatenate([zis, zjs], axis=0)
    big = sim(z, z)
    logits_ab = big[:b, b:]
    logits_ba = logits_ab.T
    logits_aa = big[:b, :b] - eye * LARGE_NUM
    logits_bb = big[b:, b:] - eye * LARGE_NUM

    if valid is not None:
        # padded rows must not serve as negatives in any block
        colmask = jnp.where(valid[None, :], 0.0, -LARGE_NUM)
        logits_ab = logits_ab + colmask
        logits_ba = logits_ba + colmask
        logits_aa = logits_aa + colmask
        logits_bb = logits_bb + colmask

    if inversion:
        blocks_a = [logits_ab, logits_bb]
        blocks_b = [logits_ba, logits_aa]
    else:
        blocks_a = [logits_ab, logits_aa]
        blocks_b = [logits_ba, logits_bb]
    if neg_l is not None and not inversion:
        zins = emb[neg_l].astype(zis.dtype)
        zjns = emb[neg_r].astype(zjs.dtype)
        logits_ana = sim(zis, zins)
        logits_bnb = sim(zjs, zjns)
        if neg_valid is not None:
            nvr = neg_valid if neg_valid_r is None else neg_valid_r
            logits_ana = logits_ana + jnp.where(neg_valid[None, :], 0.0,
                                                -LARGE_NUM)
            logits_bnb = logits_bnb + jnp.where(nvr[None, :], 0.0, -LARGE_NUM)
        blocks_a.append(logits_ana)
        blocks_b.append(logits_bnb)

    logits_a = jnp.concatenate(blocks_a, axis=1)
    logits_b = jnp.concatenate(blocks_b, axis=1)

    loss_a = _masked_mean_xent(logits_a, valid, w_min)
    loss_b = _masked_mean_xent(logits_b, valid, w_min)
    loss = ab_weight * loss_a + (1 - ab_weight) * loss_b

    if not with_replay_mining:
        return loss

    # hardest-negative mining: argmax of the row, second argmax if the first
    # is the row index itself (MEAformer_loss.py:40-68)
    def mine(logits):
        idx = jnp.arange(logits.shape[0])
        stg = jnp.argmax(logits, axis=1)
        zeroed = logits.at[idx, stg].set(0.0)
        stg2 = jnp.argmax(zeroed, axis=1)
        self_hit = (idx == stg)
        return jnp.where(self_hit, stg2, stg)

    l_neg = mine(logits_a)
    r_neg = mine(logits_b)
    return loss, l_neg, r_neg


def icl_loss_multi(
    embs: jnp.ndarray,
    links: jnp.ndarray,
    tau: float = 0.1,
    ab_weight: float = 0.5,
    w_min: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    matmul_dtype=None,
) -> jnp.ndarray:
    """M independent ICL losses in one batched computation.

    The reference computes its per-modality "inner view" losses as six
    sequential B x B matmul chains (SNAG.py:143-162); stacking the modality
    axis turns them into single batched einsums, which the MXU executes far
    more efficiently and XLA fuses into one pass.

    embs: (M, N, d) already L2-normalized rows; w_min: (M, B) per-row
    weights or None.  Returns (M,) losses.
    """
    zis = embs[:, links[:, 0], :]     # (M, B, d)
    zjs = embs[:, links[:, 1], :]
    if matmul_dtype is not None:
        zis = zis.astype(matmul_dtype)
        zjs = zjs.astype(matmul_dtype)
    return _icl_xent_batched(zis, zjs, w_min, valid, tau, ab_weight)


def icl_loss_stacked(
    emb_list,
    links: jnp.ndarray,
    tau: float = 0.1,
    ab_weight: float = 0.5,
    valid: Optional[jnp.ndarray] = None,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Sum of independent ICL losses over several embedding tables, batched
    through the streaming core (one (M, 2B, 2B) einsum instead of M separate
    matmul/softmax chains).  Used for SNAG's GMI = icl(joint) +
    icl(joint_fz) (SNAG.py:106)."""
    zis = jnp.stack([l2norm(e[links[:, 0]]) for e in emb_list])
    zjs = jnp.stack([l2norm(e[links[:, 1]]) for e in emb_list])
    if matmul_dtype is not None:
        zis = zis.astype(matmul_dtype)
        zjs = zjs.astype(matmul_dtype)
    return _icl_xent_batched(zis, zjs, None, valid, tau, ab_weight).sum()


def _bundle_channels(zis, zjs, a_i, a_j, beta, tau, valid):
    """Dense (M+2, 2B, 2B) channel logits from the shared modality
    similarities: [per-modality | attention-mix | fz-mix].  Fallback /
    test-reference formulation of the factored SNAG bundle."""
    m, b, d = zis.shape
    z = jnp.concatenate([zis, zjs], axis=1)                     # (M, 2B, d)
    k = jnp.einsum("mbd,mcd->mbc", z, z,
                   preferred_element_type=jnp.float32)          # unscaled
    a2 = jnp.concatenate([a_i, a_j], axis=0).astype(jnp.float32)  # (2B, M)
    mix_a = jnp.einsum("bm,cm,mbc->bc", a2, a2, k)
    mix_f = jnp.einsum("m,mbc->bc", beta.astype(jnp.float32), k)
    s = jnp.concatenate([k, mix_a[None], mix_f[None]], axis=0) / tau
    n2 = 2 * b
    eye2 = jnp.eye(n2, dtype=jnp.float32)
    s = s - eye2 * LARGE_NUM
    if valid is not None:
        v2 = jnp.concatenate([valid, valid])
        s = s + jnp.where(v2[None, None, :], 0.0, -LARGE_NUM)
    return s


def _bundle_pos(zis, zjs, a_i, a_j, beta, tau):
    posk = jnp.einsum("mbd,mbd->mb", zis, zjs,
                      preferred_element_type=jnp.float32)       # (M, B)
    pos_a = jnp.einsum("bm,bm,mb->b", a_i.astype(jnp.float32),
                       a_j.astype(jnp.float32), posk)
    pos_f = jnp.einsum("m,mb->b", beta.astype(jnp.float32), posk)
    return jnp.concatenate([posk, pos_a[None], pos_f[None]], axis=0) / tau


def _bundle_weights(w_min, valid, m, b):
    vf = (jnp.ones((b,), jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    wm = jnp.ones((m, b), jnp.float32) if w_min is None else w_min
    wt = jnp.concatenate([wm * vf[None, :], vf[None, :], vf[None, :]],
                        axis=0)                                 # (M+2, B)
    denom = jnp.maximum(vf.sum(), 1.0) if valid is not None else \
        jnp.float32(b)
    return wt, vf, denom


def _bundle_dense(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab_weight):
    m, b, d = zis.shape
    s = _bundle_channels(zis, zjs, a_i, a_j, beta, tau, valid)
    pos = _bundle_pos(zis, zjs, a_i, a_j, beta, tau)
    lse = jax.scipy.special.logsumexp(s, axis=2)                # (M+2, 2B)
    per_a = lse[:, :b] - pos
    per_b = lse[:, b:] - pos
    wt, _, denom = _bundle_weights(w_min, valid, m, b)
    return (ab_weight * (per_a * wt).sum(axis=1)
            + (1 - ab_weight) * (per_b * wt).sum(axis=1)) / denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _bundle_streamed(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab_weight):
    return _bundle_str_fwd(zis, zjs, a_i, a_j, beta, w_min, valid, tau,
                           ab_weight)[0]


def _bundle_pack(x_a, x_b, b, bp):
    pad = jnp.zeros((x_a.shape[0], bp - b), jnp.float32)
    return jnp.concatenate([x_a.astype(jnp.float32), pad,
                            x_b.astype(jnp.float32), pad], axis=1)


def _bundle_str_fwd(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab_weight):
    from snag_tpu.ops.pallas import snag_loss_kernel as sk
    m, b, d = zis.shape
    z, vcol, bp = sk._stack_z(zis, zjs, valid)
    alpha = jnp.zeros((2 * bp, 128), jnp.float32)
    alpha = alpha.at[:b, :m].set(a_i.astype(jnp.float32))
    alpha = alpha.at[bp:bp + b, :m].set(a_j.astype(jnp.float32))
    beta_arr = jnp.zeros((1, 128), jnp.float32).at[0, :m].set(
        beta.astype(jnp.float32))
    lse = sk.mixture_lse(z, alpha, beta_arr, vcol, m, tau)      # (8, 2Bp)
    pos = _bundle_pos(zis, zjs, a_i, a_j, beta, tau)            # (M+2, B)
    per_a = lse[:m + 2, :b] - pos
    per_b = lse[:m + 2, bp:bp + b] - pos
    wt, vf, denom = _bundle_weights(w_min, valid, m, b)
    loss = (ab_weight * (per_a * wt).sum(axis=1)
            + (1 - ab_weight) * (per_b * wt).sum(axis=1)) / denom
    res = (zis, zjs, a_i, a_j, beta, w_min, valid, per_a, per_b, pos, wt,
           vf, denom)
    return loss, res


def _bundle_str_bwd(tau, ab_weight, res, g):
    from snag_tpu.ops.pallas import snag_loss_kernel as sk
    (zis, zjs, a_i, a_j, beta, w_min, valid, per_a, per_b, pos, wt, vf,
     denom) = res
    m, b, d = zis.shape
    z, vcol, bp = sk._stack_z(zis, zjs, valid)
    alpha = jnp.zeros((2 * bp, 128), jnp.float32)
    alpha = alpha.at[:b, :m].set(a_i.astype(jnp.float32))
    alpha = alpha.at[bp:bp + b, :m].set(a_j.astype(jnp.float32))
    beta_arr = jnp.zeros((1, 128), jnp.float32).at[0, :m].set(
        beta.astype(jnp.float32))

    ca = (g[:, None] * ab_weight) * wt / denom                  # (M+2, B)
    cb = (g[:, None] * (1 - ab_weight)) * wt / denom
    cpad = jnp.zeros((sk.C_PAD - (m + 2), 2 * bp), jnp.float32)
    coef = jnp.concatenate([_bundle_pack(ca, cb, b, bp), cpad], axis=0)
    lse = jnp.concatenate(
        [_bundle_pack(per_a + pos, per_b + pos, b, bp), cpad], axis=0)
    dz, da, db = sk.mixture_grad(z, alpha, beta_arr, lse, coef, vcol, m,
                                 tau)
    d_zis = dz[:, :b].astype(zis.dtype)
    d_zjs = dz[:, bp:bp + b].astype(zjs.dtype)
    d_ai = da[:b, :m].astype(a_i.dtype)
    d_aj = da[bp:bp + b, :m].astype(a_j.dtype)
    d_beta = db[0, :m].astype(beta.dtype)
    if w_min is None:
        d_w = None
    else:
        base = (ab_weight * per_a[:m] + (1 - ab_weight) * per_b[:m]) \
            * vf[None, :]
        d_w = g[:m, None] * base / denom
    d_valid = (None if valid is None
               else np.zeros(valid.shape, dtype=jax.dtypes.float0))
    return d_zis, d_zjs, d_ai, d_aj, d_beta, d_w, d_valid


_bundle_streamed.defvjp(_bundle_str_fwd, _bundle_str_bwd)


def snag_bundle_losses(zis, zjs, a_i, a_j, beta, w_min=None, valid=None,
                       tau: float = 0.1, ab_weight: float = 0.5):
    """(M+2,) NT-Xent losses over the shared modality similarities:
    per-modality ICL (ECIA channels, weighted by ``w_min``) plus SNAG's
    two joint-path ICLs (GMI) computed from the FACTORED similarities
    instead of explicit (B, M*d) joint embeddings (module comment of
    ops/pallas/snag_loss_kernel.py; reference math SNAG.py:106,
    SNAG_tools.py:44-49, SNAG_loss.py:58-128).

    zis/zjs: (M, B, d) unit rows; a_i/a_j: (B, M) L2-normalized per-row
    attention weights; beta: (M,) fz mixture (sums to 1); w_min: (M, B).
    """
    from snag_tpu.ops.pallas import snag_loss_kernel as sk
    m, b, d = zis.shape
    if sk.streaming_ok(m, b, d):
        return _bundle_streamed(zis, zjs, a_i, a_j, beta, w_min, valid,
                                tau, ab_weight)
    return _bundle_dense(zis, zjs, a_i, a_j, beta, w_min, valid, tau,
                         ab_weight)


def ial_loss(
    src_emb: jnp.ndarray,
    tar_emb: jnp.ndarray,
    links: jnp.ndarray,
    tau: float = 4.0,
    ab_weight: float = 0.5,
    zoom: float = 0.1,
    reduction: str = "mean",
    valid: Optional[jnp.ndarray] = None,
    norm: bool = True,
    inversion: bool = False,
) -> jnp.ndarray:
    """Unimodal->joint KL alignment (SNAG_loss.py:130-202).

    KL(softmax(q/tau) || softmax(p/tau)) elementwise, q detached, torch
    `kl_div(log_softmax(p), softmax(q))` convention with mean/sum reduction
    over all matrix elements.  ``inversion`` concatenates the opposite KG's
    intra block ([ab | bb] / [ba | aa], SNAG_loss.py:179-188).
    """
    if norm:
        src_emb = l2norm(src_emb)
        tar_emb = l2norm(tar_emb)
    s_i, s_j = src_emb[links[:, 0]], src_emb[links[:, 1]]
    t_i, t_j = tar_emb[links[:, 0]], tar_emb[links[:, 1]]
    b = s_i.shape[0]
    eye = jnp.eye(b, dtype=src_emb.dtype)

    def blocks(x, y):
        # intra block from y when inversion (the opposite side), else from x
        intra = y if inversion else x
        ab = x @ y.T / tau
        aa = intra @ intra.T / tau - eye * LARGE_NUM
        if valid is not None:
            colmask = jnp.where(valid[None, :], 0.0, -LARGE_NUM)
            ab = ab + colmask
            aa = aa + colmask
        return jnp.concatenate([ab, aa], axis=1)

    p_ab = blocks(s_i, s_j)
    p_ba = blocks(s_j, s_i)
    q_ab = jax.lax.stop_gradient(blocks(t_i, t_j))
    q_ba = jax.lax.stop_gradient(blocks(t_j, t_i))

    def kl(p, q):
        logp = jax.nn.log_softmax(p, axis=1)
        qprob = jax.nn.softmax(q, axis=1)
        logq = jax.nn.log_softmax(q, axis=1)
        elem = qprob * (logq - logp)  # torch kl_div(log_p, q) elementwise
        if valid is not None:
            elem = jnp.where(valid[:, None], elem, 0.0)
            denom_rows = jnp.maximum(valid.sum(), 1)
        else:
            denom_rows = p.shape[0]
        if reduction == "sum":
            return elem.sum()
        # mean over all elements of the (B, 2B)-shaped matrix
        return elem.sum() / (denom_rows * p.shape[1])

    loss_a = kl(p_ab, q_ab)
    loss_b = kl(p_ba, q_ba)
    return zoom * (ab_weight * loss_a + (1 - ab_weight) * loss_b)


def nca_loss(
    emb: jnp.ndarray,
    links: jnp.ndarray,
    alpha: float = 15.0,
    beta: float = 10.0,
    ep: float = 0.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """EVA's NCA alignment loss (EVA_tools.py:80-148)."""
    emb = l2norm(emb)
    im = emb[links[:, 0]]
    s = emb[links[:, 1]]
    b = im.shape[0]
    eye = jnp.eye(b, dtype=emb.dtype)
    scores = im @ s.T
    s_diag = eye * scores
    s_exp = jnp.exp(alpha * (scores - ep))
    s_exp = s_exp - s_exp * eye
    if valid is not None:
        vm = valid.astype(emb.dtype)
        s_exp = s_exp * vm[None, :] * vm[:, None]
        s_diag = s_diag * vm[:, None]
        denom = jnp.maximum(valid.sum(), 1)
    else:
        denom = b
    loss_diag = -jnp.log(1 + jax.nn.relu(s_diag.sum(axis=0)))
    per = (jnp.log(1 + s_exp.sum(axis=0)) / alpha
           + jnp.log(1 + s_exp.sum(axis=1)) / alpha
           + loss_diag * beta)
    if valid is not None:
        per = jnp.where(valid, per, 0.0)
    return per.sum() / denom
