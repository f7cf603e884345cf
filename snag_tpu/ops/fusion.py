"""Modality fusion modules.

* ``MformerFusion`` — the SNAG/MEAformer fusion transformer over per-entity
  modality tokens (reference: SNAG_MMEA/model/SNAG_tools.py:23-51 fusion
  head, :158-298 BertLayer stack; MEAformer variant has no frozen-weight
  path, MEAformer_tools.py:25-72).
* ``MeanFusion``    — MCLEA's learnable-softmax weighted mean
  (MCLEA_tools.py:20-38).
* ``WeightedConcatFusion`` — EVA's detached weighted concat (EVA.py:146-165).

The token axis is tiny (M = 3–6); the hot dimension is N_ent.  Everything is
expressed as batched dense ops so XLA tiles the (N, M, d) tensors onto the
MXU; a fused Pallas path for the full layer stack lives in ops/pallas/.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops import inits


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics (norm clamped at eps).

    The clamp goes INSIDE the sqrt: ``linalg.norm``'s VJP at an exactly-zero
    row is 0 * inf = NaN even when the clamped value is unused downstream
    (zero-feature entities project to 0 at init and poisoned full-table
    weight grads through the sum over rows)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / n


# tiny-M attention core formulation: "broadcast" (default) or "unrolled".
# Both are VPU multiply-reduce (batched MxM matmuls lower to convolutions
# with terrible MXU utilisation); broadcast keeps the op count constant in
# M, unrolled emits M^2 small fusions.  Module-level so A/B scripts can
# flip it per-jit without config plumbing.
TINY_ATTN_IMPL = "broadcast"

# QKV projections as one (d, 3d) matmul (True) vs three (d, d) matmuls
# (False) — same params either way; module-level DEFAULT, overridable
# per-layer via BertLayer(fold_qkv=...).  Measured (2026-08-19, TPU v5e):
# neutral at MMEA geometry (d=300, N=30K: 38.6-39.1 ms all combos) where it
# buys a 3.4x smaller jaxpr, but -25% MKGC train throughput at d=128
# (298K vs 393K triples/s — the per-step weight concat + grad split beats
# three small matmuls' fusion; scripts/ab_mkgc.py), so MKGC passes False.
FOLD_QKV = True


def _tiny_scores_ctx(q, k, v, M, dh, dropout, deterministic):
    scale = 1.0 / np.sqrt(dh)
    if TINY_ATTN_IMPL == "broadcast":
        scores = (q[:, :, :, None, :].astype(jnp.float32)
                  * k[:, :, None, :, :].astype(jnp.float32)
                  ).sum(-1) * scale                         # (N, H, M, M)
        probs = jax.nn.softmax(scores, axis=-1)
        pd = dropout(probs, deterministic=deterministic)
        pdv = pd.astype(v.dtype)
        ctx = (pdv[:, :, :, :, None]
               * v[:, :, None, :, :]).sum(-2)               # (N, H, M, dh)
    else:
        scores = jnp.stack(
            [jnp.stack(
                [(q[:, :, qi, :].astype(jnp.float32)
                  * k[:, :, ki, :].astype(jnp.float32)).sum(-1) * scale
                 for ki in range(M)], axis=-1)
             for qi in range(M)], axis=-2)                  # (N, H, M, M)
        probs = jax.nn.softmax(scores, axis=-1)
        pd = dropout(probs, deterministic=deterministic)
        pdv = pd.astype(v.dtype)
        ctx = jnp.stack(
            [sum(pdv[:, :, qi, ki, None] * v[:, :, ki, :]
                 for ki in range(M))
             for qi in range(M)], axis=2)                   # (N, H, M, dh)
    return probs, ctx


class LinParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}) for
    layers that consume raw weight arrays (the folded-QKV matmul below)
    while keeping the checkpoint tree identical to nn.Dense."""
    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", inits.torch_linear_kernel,
                       (self.fin, self.fout))
        b = self.param("bias", inits.torch_linear_bias(self.fin),
                       (self.fout,))
        return k, b


def _tdense(features: int, in_features: int, name: str, dtype=jnp.float32):
    """Dense with torch nn.Linear default init at the REFERENCE's fan-in.

    ``in_features`` can exceed the actual input width: the reference pads
    its bag-of-relations table to 1000 columns (src/data.py:521-538), so
    rel_fc's torch init draws at fan_in=1000 even though only n_rel
    columns ever carry signal.  The kernel must use the same override —
    initializing at the truncated width made rel_fc ~7x hotter at init
    and cost ~4.8 pt MRR at the 4K-entity fixed-budget co-run (found by
    training ours from the imported reference init: 0.606 vs 0.559)."""
    return nn.Dense(
        features, name=name, dtype=dtype,
        kernel_init=inits.torch_linear_kernel_fan(in_features),
        bias_init=inits.torch_linear_bias(in_features))


class BertSelfAttention(nn.Module):
    """Multi-head self-attention over the modality-token axis
    (SNAG_tools.py:158-209; dropout 0.1 hardcoded there).

    ``fold_qkv``: None = module default FOLD_QKV (see its A/B note)."""
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    fold_qkv: Optional[bool] = None

    @nn.compact
    def __call__(self, hidden, *, deterministic: bool = True):
        d, H = self.hidden_size, self.num_heads
        assert d % H == 0
        dh = d // H
        N, M, _ = hidden.shape

        # one (d, 3d) matmul instead of three (d, d): hidden is read once
        # and the backward emits ONE weight-grad reduce + ONE dX matmul
        # (param tree unchanged — the holders mirror nn.Dense's scopes)
        wq, bq = LinParams(d, d, name="query")()
        wk, bk = LinParams(d, d, name="key")()
        wv, bv = LinParams(d, d, name="value")()
        fold = FOLD_QKV if self.fold_qkv is None else self.fold_qkv
        if fold:
            wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = hidden @ wqkv + bqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = hidden @ wq.astype(self.dtype) + bq.astype(self.dtype)
            k = hidden @ wk.astype(self.dtype) + bk.astype(self.dtype)
            v = hidden @ wv.astype(self.dtype) + bv.astype(self.dtype)

        def split(x):  # (N, M, d) -> (N, H, M, dh)
            return x.reshape(N, M, H, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if M <= 6:
            probs, ctx = _tiny_scores_ctx(
                q, k, v, M, dh, nn.Dropout(0.1), deterministic)
        else:
            scores = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                                preferred_element_type=jnp.float32) / np.sqrt(dh)
            probs = jax.nn.softmax(scores, axis=-1)
            probs_dropped = nn.Dropout(0.1)(probs, deterministic=deterministic)
            ctx = jnp.einsum("nhqk,nhkd->nhqd", probs_dropped.astype(v.dtype),
                             v, preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(N, M, d)
        return ctx, probs


class BertLayer(nn.Module):
    """Attention + residual LN (+ optional GELU intermediate) block
    (SNAG_tools.py:268-298); LN eps 1e-12, dropouts 0.1.

    A whole-layer fused Pallas kernel existed through round 3
    (ops/pallas/mformer_kernel.py, 507 LoC) but never beat this XLA
    path at any measured geometry (r3 A/B: 1L/1H 76.5 vs 74.4 ms,
    2L/2H 93.7 vs 93.2 ms model fwd+bwd; r4 trace: the whole Mformer
    block is 3.6 ms of the 37 ms step once batch_encode gathers rows
    first), so it was deleted per VERDICT r3 item 4 — git cc8ad3f^
    has the kernel and scripts/{ab,check}_fused if ever needed.
    """
    hidden_size: int
    num_heads: int
    intermediate_size: int
    use_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32
    fold_qkv: Optional[bool] = None   # None = module default FOLD_QKV

    @nn.compact
    def __call__(self, hidden, *, deterministic: bool = True):
        ctx, probs = BertSelfAttention(
            self.hidden_size, self.num_heads, self.dtype,
            fold_qkv=self.fold_qkv, name="self")(
                hidden, deterministic=deterministic)
        ctx = _tdense(self.hidden_size, self.hidden_size, "att_out", self.dtype)(ctx)
        ctx = nn.Dropout(0.1)(ctx, deterministic=deterministic)
        # dtype: keep the (N, M, d) chain in the compute dtype — an
        # unspecified LayerNorm dtype promotes everything downstream to
        # f32, doubling the per-pass HBM traffic (statistics still
        # accumulate in f32 inside flax)
        attention_output = nn.LayerNorm(epsilon=1e-12, name="att_ln",
                                        dtype=self.dtype)(ctx + hidden)

        if not self.use_intermediate:
            return attention_output, probs

        inter = _tdense(self.intermediate_size, self.hidden_size,
                        "intermediate", self.dtype)(attention_output)
        inter = nn.gelu(inter, approximate=False)
        out = _tdense(self.hidden_size, self.intermediate_size,
                      "output", self.dtype)(inter)
        out = nn.Dropout(0.1)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-12, name="out_ln",
                           dtype=self.dtype)(out + attention_output)
        return out, probs


class MformerFusion(nn.Module):
    """SNAG fusion: transformer over modality tokens + two joint paths.

    Returns (joint_emb, joint_emb_fz, hidden_states, weight_norm):
    * ``weight_norm``  — per-entity modality weights from the last layer's
      attention: softmax(sum_heads sum_queries attn / sqrt(M*H))
      (SNAG_tools.py:41-43);
    * ``joint_emb``    — attention-weighted concat of normalized input embs;
    * ``joint_emb_fz`` — global learnable-weight path via ``weight_raw``
      (softmax over the full 6-slot vector, SNAG_tools.py:46-49).  Pass
      ``with_fz=False`` for the MEAformer variant (single path).
    """
    hidden_size: int
    num_heads: int
    num_layers: int
    intermediate_size: int
    use_intermediate: bool = True
    with_fz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs: List[Optional[jnp.ndarray]], *,
                 deterministic: bool = True):
        active = [e for e in embs if e is not None]
        modal_num = len(active)
        # compute dtype for the transformer stack (the GAT branch arrives
        # f32; mixing would promote every (N, M, d) pass to f32)
        hidden = jnp.stack([e.astype(self.dtype) for e in active], axis=1)

        probs = None
        for i in range(self.num_layers):
            hidden, probs = BertLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.use_intermediate, self.dtype,
                name=f"layer_{i}")(
                    hidden, deterministic=deterministic)

        # attention-derived per-entity modality weights (pre-dropout probs)
        attention_pro = probs.sum(axis=1)            # (N, M, M) sum heads
        attention_pro_comb = attention_pro.sum(axis=-2) / np.sqrt(
            modal_num * self.num_heads)              # (N, M) sum queries
        weight_norm = jax.nn.softmax(attention_pro_comb, axis=-1)

        normed = [l2norm(e) for e in active]
        joint_emb = jnp.concatenate(
            [weight_norm[:, i:i + 1] * normed[i] for i in range(modal_num)],
            axis=1)

        joint_emb_fz = None
        weight_fz = None
        if self.with_fz:
            weight_raw = self.param("weight_raw", jax.nn.initializers.ones, (6,))
            # softmax spans all 6 slots even when fewer are active (parity
            # with SNAG_tools.py:46: softmax over the full parameter).
            weight_fz = jax.nn.softmax(weight_raw, axis=0)
            joint_emb_fz = jnp.concatenate(
                [weight_fz[i] * normed[i] for i in range(modal_num)], axis=1)

        return joint_emb, joint_emb_fz, hidden, weight_norm, weight_fz


class MeanFusion(nn.Module):
    """MCLEA MultiModalFusion: softmax-weighted normalized embs, stacked and
    mean-pooled (MCLEA_tools.py:20-38).  The softmax spans all modal_num
    slots; inactive (None) embs are dropped after weighting, like the
    reference list comprehension."""
    modal_num: int
    with_weight: int = 1

    @nn.compact
    def __call__(self, embs: List[Optional[jnp.ndarray]]):
        weight = self.param("weight", jax.nn.initializers.ones, (self.modal_num, 1))
        weight_norm = jax.nn.softmax(weight, axis=0)
        parts = [weight_norm[i] * l2norm(embs[i])
                 for i in range(self.modal_num) if embs[i] is not None]
        hidden = jnp.stack(parts, axis=1)
        return hidden.mean(axis=1)


class WeightedConcatFusion(nn.Module):
    """EVA fusion: concat of w_i * normalize(emb_i) with stop_gradient on the
    embeddings so only the weights learn through the joint loss
    (EVA.py:146-165)."""
    modal_num: int
    detach: bool = True

    @nn.compact
    def __call__(self, embs: List[Optional[jnp.ndarray]]):
        weight_raw = self.param("weight_raw", jax.nn.initializers.ones,
                                (self.modal_num,))
        w = jax.nn.softmax(weight_raw, axis=0)
        parts = []
        for i, e in enumerate(embs):
            if e is None:
                continue
            e = l2norm(e)
            if self.detach:
                e = jax.lax.stop_gradient(e)
            parts.append(w[i] * e)
        return jnp.concatenate(parts, axis=1)
