"""custom-VJP wrapper wiring the fused Mformer kernel into BertLayer.

``fused_bert_layer`` runs ops/pallas/mformer_kernel.py's forward and
backward kernels (ONE launch each) for the whole BertLayer.  The backward
recomputes the layer inside the kernel (VMEM-resident, including
regenerated dropout masks from the same per-tile seed), so the only
residuals are the layer inputs.

Parameter plumbing: the flax param tree must stay identical to the
eager BertLayer (`layer_i/self/query/{kernel,bias}`, `att_out`,
`att_ln`, ...) so checkpoints and golden tests are branch-independent —
ops/fusion.py declares the SAME names through the holder modules below
and passes raw arrays here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops import inits
from snag_tpu.ops.pallas import mformer_kernel as mk
from snag_tpu.ops.pallas.tile_segment import pallas_available

PARAM_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "be1",
               "wi", "bi", "wo2", "bo2", "g2", "be2")


class LinParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias})."""
    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", inits.torch_linear_kernel,
                       (self.fin, self.fout))
        b = self.param("bias", inits.torch_linear_bias(self.fin),
                       (self.fout,))
        return k, b


class LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree ({scale, bias})."""
    d: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.d,))
        b = self.param("bias", nn.initializers.zeros, (self.d,))
        return s, b


class SelfAttnParams(nn.Module):
    """Holder mirroring BertSelfAttention's 'self' scope."""
    d: int

    @nn.compact
    def __call__(self):
        q = LinParams(self.d, self.d, name="query")()
        k = LinParams(self.d, self.d, name="key")()
        v = LinParams(self.d, self.d, name="value")()
        return q, k, v


def _prepare(hidden, raws, m, d, inter_d, use_inter, dtype):
    n = hidden.shape[0]
    n_tiles = -(-n // mk.R)
    n_pad = n_tiles * mk.R
    d_pad = mk._round_up(d, 128)
    hp = jnp.pad(hidden.astype(dtype),
                 ((0, n_pad - n), (0, 0), (0, d_pad - d)))
    raw = dict(zip(PARAM_ORDER[:10] if not use_inter else PARAM_ORDER, raws))
    pp = mk.pad_layer_params(raw, d, inter_d if use_inter else 0, dtype)
    return hp, pp, n_tiles, n_pad, d_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_bert_layer(hidden, raws, seed, m, d, inter_d, use_inter, training):
    """hidden: (N, M, d); raws: tuple of raw param arrays in PARAM_ORDER
    (first 10 when use_inter=False).  Returns (out (N, M, d),
    probs (N, M, M) f32)."""
    return _fwd(hidden, raws, seed, m, d, inter_d, use_inter, training)[0]


def _fwd(hidden, raws, seed, m, d, inter_d, use_inter, training):
    dtype = hidden.dtype
    hp, pp, n_tiles, n_pad, d_pad = _prepare(hidden, raws, m, d, inter_d,
                                             use_inter, dtype)
    out_p, probs_p = mk.mformer_layer_fwd(
        hp, pp, seed, m=m, d=d, inter_d=inter_d, use_inter=use_inter,
        training=training, n_tiles=n_tiles)
    n = hidden.shape[0]
    out = out_p[:n, :, :d]
    probs = probs_p[:n, :m * m].reshape(n, m, m)
    return (out, probs), (hidden, raws, seed)


def _bwd(m, d, inter_d, use_inter, training, res, cts):
    hidden, raws, seed = res
    g_out, g_probs = cts
    dtype = hidden.dtype
    n = hidden.shape[0]
    hp, pp, n_tiles, n_pad, d_pad = _prepare(hidden, raws, m, d, inter_d,
                                             use_inter, dtype)
    go = jnp.pad(g_out.astype(dtype),
                 ((0, n_pad - n), (0, 0), (0, d_pad - d)))
    gp = jnp.pad(g_probs.astype(jnp.float32).reshape(n, m * m),
                 ((0, n_pad - n), (0, 128 - m * m)))
    gh_p, grads = mk.mformer_layer_bwd(
        hp, go, gp, pp, seed, m=m, d=d, inter_d=inter_d,
        use_inter=use_inter, training=training, n_tiles=n_tiles)
    g_hidden = gh_p[:n, :, :d].astype(hidden.dtype)

    names = PARAM_ORDER[:10] if not use_inter else PARAM_ORDER
    sizes = {"wq": (d, d), "bq": (d,), "wk": (d, d), "bk": (d,),
             "wv": (d, d), "bv": (d,), "wo": (d, d), "bo": (d,),
             "g1": (d,), "be1": (d,), "wi": (d, inter_d), "bi": (inter_d,),
             "wo2": (inter_d, d), "bo2": (d,), "g2": (d,), "be2": (d,)}
    g_raws = []
    for nm, raw in zip(names, raws):
        g = grads[nm]
        s = sizes[nm]
        if len(s) == 1:
            g = g[0, :s[0]]
        else:
            g = g[:s[0], :s[1]]
        g_raws.append(g.astype(raw.dtype))
    return g_hidden, tuple(g_raws), np.zeros((), dtype=jax.dtypes.float0)


fused_bert_layer.defvjp(_fwd, _bwd)


def fused_available(num_heads: int, m: int) -> bool:
    return pallas_available() and num_heads == 1 and 2 <= m <= 6
