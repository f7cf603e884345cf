"""Fused Mformer BertLayer — ONE Pallas launch per layer, fwd and bwd.

The modality-token transformer (reference SNAG_MMEA/model/SNAG_tools.py:
158-298) operates on (N, M<=6, d) tokens.  In XLA each layer decomposes
into ~14 separate (N, M, d)-sized passes (QKV, attention, dropouts,
residuals, two LayerNorms, GELU FFN) — each ~1 ms of HBM traffic at
N=30K (traced).  This kernel keeps a 128-entity tile resident in VMEM
through the WHOLE layer: the tokens are read once and written once.

Scope: single attention head (the canonical SNAG/MEAformer config),
M <= 6, hidden d and intermediate width padded to lane multiples.
Dropout (p=0.1, the reference's hardcoded rate) runs on the in-kernel
PRNG; the backward kernel re-seeds identically and regenerates the same
masks.  Weight gradients accumulate across tiles in grid-resident output
blocks (constant index map), so the backward is also one launch.

Numerical layout notes:
* lanes >= d are zero everywhere; LayerNorm statistics divide by the
  TRUE width and mask (x - mean) on dead lanes;
* matmuls run in the input dtype (bf16 production) with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _OK = True
except Exception:  # pragma: no cover
    _OK = False

R = 128           # entities per tile
DROP_P = 0.1      # reference hardcoded dropout (SNAG_tools.py)
KEEP = 1.0 - DROP_P
KEEP_THRESH = np.uint32(int(KEEP * (2 ** 32 - 1)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_fwd(x, gamma, beta, d, lane_mask):
    """LayerNorm over the first d lanes; x zero on dead lanes."""
    mu = jnp.sum(x, axis=-1, keepdims=True) / d
    diff = (x - mu) * lane_mask
    var = jnp.sum(diff * diff, axis=-1, keepdims=True) / d
    rstd = jax.lax.rsqrt(var + 1e-12)
    xhat = diff * rstd
    return xhat * gamma + beta * lane_mask, xhat, rstd


def _ln_bwd(g, xhat, rstd, gamma, d, lane_mask):
    """dx for LayerNorm; also returns (dgamma, dbeta) partial sums."""
    g = g * lane_mask
    dgamma = jnp.sum(g * xhat, axis=0)
    dbeta = jnp.sum(g, axis=0)
    gg = g * gamma
    m1 = jnp.sum(gg, axis=-1, keepdims=True) / d
    m2 = jnp.sum(gg * xhat, axis=-1, keepdims=True) / d
    dx = (gg - m1 - xhat * m2) * rstd * lane_mask
    return dx, dgamma, dbeta


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — at f32
    resolution); Pallas TPU has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


def _gelu_grad(x):
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * x * x) * (1.0 / np.sqrt(2.0 * np.pi))
    return cdf + x * pdf


def _dropout_mask(shape, salt: int):
    """Regenerable dropout mask; caller must have seeded the PRNG."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    return jnp.where(bits <= KEEP_THRESH, 1.0 / KEEP, 0.0)


def _layer_core(hidden, params, m, d, d_pad, i_pad, inter_d, use_inter,
                lane_mask, inter_mask, training: bool):
    """Shared fwd computation; returns all intermediates needed by bwd.

    hidden: (R*M, d_pad) f32-convertible; params: dict of padded weights.
    Dropout masks are drawn IN ORDER (probs, attn_out, ffn_out) so the
    backward regenerates them identically after one seed call.
    """
    dt = hidden.dtype
    flat = hidden
    q = jnp.dot(flat, params["wq"], preferred_element_type=jnp.float32) \
        + params["bq"]
    k = jnp.dot(flat, params["wk"], preferred_element_type=jnp.float32) \
        + params["bk"]
    v = jnp.dot(flat, params["wv"], preferred_element_type=jnp.float32) \
        + params["bv"]

    q3 = q.reshape(R, m, d_pad)
    k3 = k.reshape(R, m, d_pad)
    v3 = v.reshape(R, m, d_pad)
    scale = 1.0 / np.sqrt(d)

    scores = []
    for qi in range(m):
        row = []
        for ki in range(m):
            row.append(jnp.sum(q3[:, qi, :] * k3[:, ki, :], axis=-1) * scale)
        scores.append(row)
    # softmax per query token
    probs = []
    for qi in range(m):
        mx = scores[qi][0]
        for ki in range(1, m):
            mx = jnp.maximum(mx, scores[qi][ki])
        es = [jnp.exp(scores[qi][ki] - mx) for ki in range(m)]
        den = es[0]
        for ki in range(1, m):
            den = den + es[ki]
        inv = 1.0 / den
        probs.append([es[ki] * inv for ki in range(m)])

    if training:
        pmask = _dropout_mask((R, m * m), 0)
        pd = [[probs[qi][ki] * pmask[:, qi * m + ki] for ki in range(m)]
              for qi in range(m)]
    else:
        pd = probs

    ctx = []
    for qi in range(m):
        acc = pd[qi][0][:, None] * v3[:, 0, :]
        for ki in range(1, m):
            acc = acc + pd[qi][ki][:, None] * v3[:, ki, :]
        ctx.append(acc)
    ctx_flat = jnp.concatenate(
        [c[:, None, :] for c in ctx], axis=1).reshape(R * m, d_pad)

    attn = jnp.dot(ctx_flat.astype(dt), params["wo"],
                   preferred_element_type=jnp.float32) + params["bo"]
    if training:
        amask = _dropout_mask((R * m, d_pad), 1)
        attn = attn * amask
    else:
        amask = None
    res1 = attn + flat.astype(jnp.float32)
    ln1, xhat1, rstd1 = _ln_fwd(res1, params["g1"], params["be1"], d,
                                lane_mask)

    if not use_inter:
        return dict(q=q, k=k, v=v, probs=probs, pd=pd, ctx=ctx_flat,
                    amask=amask, xhat1=xhat1, rstd1=rstd1, ln1=ln1,
                    out=ln1, pre=None, inter=None, fmask=None,
                    xhat2=None, rstd2=None)

    pre = jnp.dot(ln1.astype(dt), params["wi"],
                  preferred_element_type=jnp.float32) + params["bi"]
    inter = _gelu(pre) * inter_mask
    out2 = jnp.dot(inter.astype(dt), params["wo2"],
                   preferred_element_type=jnp.float32) + params["bo2"]
    if training:
        fmask = _dropout_mask((R * m, d_pad), 2)
        out2 = out2 * fmask
    else:
        fmask = None
    res2 = out2 + ln1
    ln2, xhat2, rstd2 = _ln_fwd(res2, params["g2"], params["be2"], d,
                                lane_mask)
    return dict(q=q, k=k, v=v, probs=probs, pd=pd, ctx=ctx_flat,
                amask=amask, xhat1=xhat1, rstd1=rstd1, ln1=ln1,
                pre=pre, inter=inter, fmask=fmask, xhat2=xhat2,
                rstd2=rstd2, out=ln2)


def _fwd_kernel(seed_ref, hid_ref, *rest, m, d, d_pad, i_pad, inter_d,
                use_inter, training, n_w):
    wrefs = rest[:n_w]
    out_ref, probs_ref = rest[n_w:n_w + 2]
    t = pl.program_id(0)
    if training:
        pltpu.prng_seed(seed_ref[0] + t)
    params = {}
    names = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "be1"]
    if use_inter:
        names += ["wi", "bi", "wo2", "bo2", "g2", "be2"]
    for i, n in enumerate(names):
        w = wrefs[i][...]
        params[n] = w[0] if (n[0] == "b" or n[0] == "g") and w.ndim == 2 \
            and w.shape[0] == 1 else w

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
    lane_mask = (lane < d).astype(jnp.float32)
    inter_lane = jax.lax.broadcasted_iota(jnp.int32, (1, i_pad), 1)
    inter_mask = (inter_lane < inter_d).astype(jnp.float32)

    hidden = hid_ref[...].reshape(R * m, d_pad)
    outs = _layer_core(hidden, params, m, d, d_pad, i_pad, inter_d,
                       use_inter, lane_mask, inter_mask, training)
    out_ref[...] = outs["out"].astype(out_ref.dtype).reshape(R, m, d_pad)
    pr = jnp.zeros((R, 128), jnp.float32)
    for qi in range(m):
        for ki in range(m):
            pr = pr + outs["probs"][qi][ki][:, None] * (
                jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
                == qi * m + ki)
    probs_ref[...] = pr


def mformer_layer_fwd(hidden, params_padded, seed, *, m, d, inter_d,
                      use_inter, training, n_tiles):
    """hidden: (n_tiles*R, M, d_pad).  Returns (out, probs (N,128))."""
    d_pad = hidden.shape[-1]
    i_pad = params_padded["wi"].shape[1] if use_inter else 128
    names = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "be1"]
    if use_inter:
        names += ["wi", "bi", "wo2", "bo2", "g2", "be2"]
    w_in = [params_padded[n] for n in names]
    n_w = len(names)

    w_specs = [pl.BlockSpec(w.shape,
                            lambda t, s, _n=len(w.shape): (0,) * _n)
               for w in w_in]
    out, probs = pl.pallas_call(
        functools.partial(_fwd_kernel, m=m, d=d, d_pad=d_pad, i_pad=i_pad,
                          inter_d=inter_d, use_inter=use_inter,
                          training=training, n_w=n_w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((R, m, d_pad),
                                   lambda t, s: (t, 0, 0))] + w_specs,
            out_specs=[
                pl.BlockSpec((R, m, d_pad), lambda t, s: (t, 0, 0)),
                pl.BlockSpec((R, 128), lambda t, s: (t, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(hidden.shape, hidden.dtype),
            jax.ShapeDtypeStruct((hidden.shape[0], 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray([seed], jnp.int32), hidden, *w_in)
    return out, probs


def xla_layer_reference(hidden, params_padded, *, m, d, inter_d, use_inter,
                        lane_valid):
    """Deterministic XLA reference of the SAME padded math (tests)."""
    n = hidden.shape[0]
    d_pad = hidden.shape[-1]
    flat = hidden.reshape(n * m, d_pad).astype(jnp.float32)
    p = {k: v.astype(jnp.float32) for k, v in params_padded.items()}
    lane_mask = (jnp.arange(d_pad) < d).astype(jnp.float32)[None, :]

    q = flat @ p["wq"] + p["bq"]
    k = flat @ p["wk"] + p["bk"]
    v = flat @ p["wv"] + p["bv"]
    q3 = q.reshape(n, m, d_pad)
    k3 = k.reshape(n, m, d_pad)
    v3 = v.reshape(n, m, d_pad)
    scores = jnp.einsum("nqd,nkd->nqk", q3, k3) / np.sqrt(d)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("nqk,nkd->nqd", probs, v3).reshape(n * m, d_pad)
    attn = ctx @ p["wo"] + p["bo"]
    res1 = attn + flat

    def ln(x, g, b):
        mu = x.sum(-1, keepdims=True) / d
        diff = (x - mu) * lane_mask
        var = (diff * diff).sum(-1, keepdims=True) / d
        xh = diff * jax.lax.rsqrt(var + 1e-12)
        return xh * g + b * lane_mask

    ln1 = ln(res1, p["g1"], p["be1"])
    if not use_inter:
        return ln1.reshape(n, m, d_pad), probs
    i_pad = p["wi"].shape[1]
    imask = (jnp.arange(i_pad) < inter_d).astype(jnp.float32)[None, :]
    pre = ln1 @ p["wi"] + p["bi"]
    inter = _gelu(pre) * imask
    out2 = inter @ p["wo2"] + p["bo2"]
    ln2 = ln(out2 + ln1, p["g2"], p["be2"])
    return ln2.reshape(n, m, d_pad), probs


def pad_layer_params(raw, d, inter_d, dtype):
    """raw: dict with wq..wo (d,d), biases (d,), LN scale/bias (d,),
    wi (d,inter), wo2 (inter,d).  Returns padded dict."""
    d_pad = _round_up(d, 128)
    i_pad = _round_up(inter_d, 128) if "wi" in raw else 0

    def padw(w, r, c):
        out = jnp.zeros((r, c), dtype)
        return out.at[:w.shape[0], :w.shape[1]].set(w.astype(dtype))

    def padv(b, c):
        out = jnp.zeros((1, c), jnp.float32)
        return out.at[0, :b.shape[0]].set(b.astype(jnp.float32))

    out = {
        "wq": padw(raw["wq"], d_pad, d_pad), "bq": padv(raw["bq"], d_pad),
        "wk": padw(raw["wk"], d_pad, d_pad), "bk": padv(raw["bk"], d_pad),
        "wv": padw(raw["wv"], d_pad, d_pad), "bv": padv(raw["bv"], d_pad),
        "wo": padw(raw["wo"], d_pad, d_pad), "bo": padv(raw["bo"], d_pad),
        "g1": padv(raw["g1"], d_pad), "be1": padv(raw["be1"], d_pad),
    }
    if "wi" in raw:
        out.update({
            "wi": padw(raw["wi"], d_pad, i_pad), "bi": padv(raw["bi"], i_pad),
            "wo2": padw(raw["wo2"], i_pad, d_pad),
            "bo2": padv(raw["bo2"], d_pad),
            "g2": padv(raw["g2"], d_pad), "be2": padv(raw["be2"], d_pad),
        })
    return out


def _bwd_kernel(seed_ref, hid_ref, gout_ref, gprobs_ref, *rest, m, d, d_pad,
                i_pad, inter_d, use_inter, training, n_w):
    wrefs = rest[:n_w]
    outs = rest[n_w:]
    ghid_ref = outs[0]
    grad_refs = outs[1:]
    t = pl.program_id(0)
    if training:
        pltpu.prng_seed(seed_ref[0] + t)
    params = {}
    names = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "be1"]
    if use_inter:
        names += ["wi", "bi", "wo2", "bo2", "g2", "be2"]
    for i, n in enumerate(names):
        w = wrefs[i][...]
        params[n] = w[0] if w.ndim == 2 and w.shape[0] == 1 \
            and n[0] in "bg" else w

    @pl.when(t == 0)
    def _():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
    lane_mask = (lane < d).astype(jnp.float32)
    inter_lane = jax.lax.broadcasted_iota(jnp.int32, (1, i_pad), 1)
    inter_mask = (inter_lane < inter_d).astype(jnp.float32)

    hidden = hid_ref[...].reshape(R * m, d_pad)
    o = _layer_core(hidden, params, m, d, d_pad, i_pad, inter_d,
                    use_inter, lane_mask, inter_mask, training)
    dt = hidden.dtype
    flat32 = hidden.astype(jnp.float32)
    g_out = gout_ref[...].reshape(R * m, d_pad).astype(jnp.float32)
    gprobs_ext = gprobs_ref[...]                    # (R, 128)

    def mmT(a, b):
        # a (r, c1), b (c2, c1) -> a @ b^T  (r, c2)
        return jax.lax.dot_general(
            a.astype(dt), b.astype(dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def Tmm(a, b):
        # a (r, c1), b (r, c2) -> a^T @ b  (c1, c2)
        return jax.lax.dot_general(
            a.astype(dt), b.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    grads = {}
    if use_inter:
        g_res2, dg2, dbe2 = _ln_bwd(g_out, o["xhat2"], o["rstd2"],
                                    params["g2"], d, lane_mask)
        g_out2 = g_res2 * o["fmask"] if training else g_res2
        grads["wo2"] = Tmm(o["inter"], g_out2)
        grads["bo2"] = jnp.sum(g_out2, axis=0)[None, :]
        g_inter = mmT(g_out2, params["wo2"])
        g_pre = g_inter * inter_mask * _gelu_grad(o["pre"])
        grads["wi"] = Tmm(o["ln1"], g_pre)
        grads["bi"] = jnp.sum(g_pre, axis=0)[None, :]
        g_ln1 = g_res2 + mmT(g_pre, params["wi"])
        grads["g2"] = dg2[None, :]
        grads["be2"] = dbe2[None, :]
    else:
        g_ln1 = g_out

    g_res1, dg1, dbe1 = _ln_bwd(g_ln1, o["xhat1"], o["rstd1"],
                                params["g1"], d, lane_mask)
    grads["g1"] = dg1[None, :]
    grads["be1"] = dbe1[None, :]
    g_attn = g_res1 * o["amask"] if training else g_res1
    g_hidden = g_res1
    grads["wo"] = Tmm(o["ctx"], g_attn)
    grads["bo"] = jnp.sum(g_attn, axis=0)[None, :]
    g_ctx = mmT(g_attn, params["wo"]).reshape(R, m, d_pad)

    v3 = o["v"].reshape(R, m, d_pad)
    q3 = o["q"].reshape(R, m, d_pad)
    k3 = o["k"].reshape(R, m, d_pad)
    scale = 1.0 / np.sqrt(d)

    g_v3 = [jnp.zeros((R, d_pad), jnp.float32) for _ in range(m)]
    g_pmat = [[None] * m for _ in range(m)]
    for qi in range(m):
        for ki in range(m):
            g_pd = jnp.sum(g_ctx[:, qi, :] * v3[:, ki, :], axis=-1)
            g_v3[ki] = g_v3[ki] + o["pd"][qi][ki][:, None] * g_ctx[:, qi, :]
            if training:
                # pd = probs * pmask; regenerate pmask contribution via
                # pd/probs is unstable — instead note d(probs) = g_pd *
                # pmask and pmask = pd / probs only where probs > 0.
                # We recover pmask * g_pd as (pd != 0) * g_pd / KEEP:
                # pmask entries are either 0 or 1/KEEP.
                keep = (o["pd"][qi][ki] != 0.0).astype(jnp.float32) / KEEP
                g_pmat[qi][ki] = g_pd * keep \
                    + gprobs_ext[:, qi * m + ki]
            else:
                g_pmat[qi][ki] = g_pd + gprobs_ext[:, qi * m + ki]

    g_q3 = [jnp.zeros((R, d_pad), jnp.float32) for _ in range(m)]
    g_k3 = [jnp.zeros((R, d_pad), jnp.float32) for _ in range(m)]
    for qi in range(m):
        sdot = o["probs"][qi][0] * g_pmat[qi][0]
        for ki in range(1, m):
            sdot = sdot + o["probs"][qi][ki] * g_pmat[qi][ki]
        for ki in range(m):
            g_s = o["probs"][qi][ki] * (g_pmat[qi][ki] - sdot) * scale
            g_q3[qi] = g_q3[qi] + g_s[:, None] * k3[:, ki, :]
            g_k3[ki] = g_k3[ki] + g_s[:, None] * q3[:, qi, :]

    def stackflat(parts):
        return jnp.concatenate([p[:, None, :] for p in parts],
                               axis=1).reshape(R * m, d_pad)

    g_q = stackflat(g_q3)
    g_k = stackflat(g_k3)
    g_v = stackflat(g_v3)
    grads["wq"] = Tmm(flat32, g_q)
    grads["bq"] = jnp.sum(g_q, axis=0)[None, :]
    grads["wk"] = Tmm(flat32, g_k)
    grads["bk"] = jnp.sum(g_k, axis=0)[None, :]
    grads["wv"] = Tmm(flat32, g_v)
    grads["bv"] = jnp.sum(g_v, axis=0)[None, :]
    g_hidden = g_hidden + mmT(g_q, params["wq"]) + mmT(g_k, params["wk"]) \
        + mmT(g_v, params["wv"])

    ghid_ref[...] = g_hidden.astype(ghid_ref.dtype).reshape(R, m, d_pad)
    for i, n in enumerate(names):
        grad_refs[i][...] += grads[n]


def mformer_layer_bwd(hidden, g_out, g_probs, params_padded, seed, *, m, d,
                      inter_d, use_inter, training, n_tiles):
    """Returns (g_hidden, grads dict matching params_padded)."""
    d_pad = hidden.shape[-1]
    i_pad = params_padded["wi"].shape[1] if use_inter else 128
    names = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "be1"]
    if use_inter:
        names += ["wi", "bi", "wo2", "bo2", "g2", "be2"]
    w_in = [params_padded[n] for n in names]
    n_w = len(names)
    w_specs = [pl.BlockSpec(w.shape,
                            lambda t, s, _n=len(w.shape): (0,) * _n)
               for w in w_in]
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_in]
    grad_specs = [pl.BlockSpec(w.shape,
                               lambda t, s, _n=len(w.shape): (0,) * _n)
                  for w in w_in]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, m=m, d=d, d_pad=d_pad, i_pad=i_pad,
                          inter_d=inter_d, use_inter=use_inter,
                          training=training, n_w=n_w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, m, d_pad), lambda t, s: (t, 0, 0)),
                pl.BlockSpec((R, m, d_pad), lambda t, s: (t, 0, 0)),
                pl.BlockSpec((R, 128), lambda t, s: (t, 0)),
            ] + w_specs,
            out_specs=[pl.BlockSpec((R, m, d_pad), lambda t, s: (t, 0, 0))]
            + grad_specs,
        ),
        out_shape=[jax.ShapeDtypeStruct(hidden.shape, hidden.dtype)]
        + grad_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray([seed], jnp.int32), hidden, g_out, g_probs, *w_in)
    g_hidden = outs[0]
    grads = {n: outs[1 + i] for i, n in enumerate(names)}
    return g_hidden, grads
