"""Graph encoders: GCN and multi-head sparse GAT over padded edge lists.

Semantics follow the reference layers (SNAG_MMEA/model/layers.py:35-133 and
the 2-layer wrappers in model/Tool_model.py:61-110 / EVA_tools.py:16-63) but
the implementation is TPU-native:

* no per-head Python loop — heads are a leading vmapped axis;
* no sparse tensors — attention/aggregation are gather + ``segment_sum``
  over the row-sorted edge list (see ops/segment.py);
* the attention normaliser is computed pre-dropout like the reference
  (layers.py:81 computes e_rowsum before F.dropout on edge_e).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.data.graph import Graph
from snag_tpu.ops import inits
from snag_tpu.ops.segment import (edge_gather_col, edge_gather_row,
                                  segment_reduce_sorted)


class GraphConvolution(nn.Module):
    """One GCN layer: out = A_norm @ (x W) + b (layers.py:102-133)."""
    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    adj_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, graph: Graph):
        stdv = 1.0 / np.sqrt(self.out_features)
        w = self.param("weight", inits.uniform_stdv(stdv),
                       (self.in_features, self.out_features))
        support = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                          preferred_element_type=jnp.float32)
        # adjacency-weighted aggregation through the row-tile kernel
        # (same primitive as the GAT; the edge weight is the normalized
        # adjacency value) — scatter-free forward AND backward
        from snag_tpu.ops.gat_agg import gat_aggregate
        agg, _ = gat_aggregate(support.astype(self.dtype),
                               graph.w[:, None].astype(self.dtype), graph)
        out = agg[:, 0, :].astype(jnp.float32)
        if self.use_bias:
            b = self.param("bias", inits.uniform_stdv(stdv), (self.out_features,))
            out = out + b
        return out


class GCN(nn.Module):
    """2-layer GCN: relu -> dropout -> linear (EVA_tools.py:52-63)."""
    nfeat: int
    nhid: int
    nout: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    adj_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, graph: Graph, *, deterministic: bool = True):
        x = GraphConvolution(self.nfeat, self.nhid, dtype=self.dtype,
                             adj_dtype=self.adj_dtype, name="gc1")(x, graph)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = GraphConvolution(self.nhid, self.nout, dtype=self.dtype,
                             adj_dtype=self.adj_dtype, name="gc2")(x, graph)
        return x


class MultiHeadGraphAttention(nn.Module):
    """Sparse GAT layer, all heads vectorized (layers.py:35-100).

    ``diag=True`` (the only mode the shipped configs use) replaces the dense
    projection with an elementwise per-head scale; w is ones-initialized and
    the attention vector a ~ U(-1/sqrt(2F), 1/sqrt(2F)) as in the reference's
    diag init path (layers.py:60-63).
    """
    n_head: int
    f_in: int
    f_out: int
    attn_dropout: float = 0.0
    diag: bool = True
    dtype: jnp.dtype = jnp.float32
    adj_dtype: jnp.dtype = jnp.bfloat16   # dense-path adjacency precision

    @nn.compact
    def __call__(self, x, graph: Graph, *, deterministic: bool = True):
        H, F = self.n_head, self.f_out
        row, col, mask = graph.row, graph.col, graph.mask
        n = graph.n_nodes

        if self.diag:
            w = self.param("w", jax.nn.initializers.ones, (H, 1, F))
            stdv = 1.0 / np.sqrt(2 * F)
            a = self.param("a_src_dst", inits.uniform_stdv(stdv), (H, 2 * F, 1))
        else:
            w = self.param("w", inits.xavier_uniform(), (H, self.f_in, F))
            a = self.param("a_src_dst", inits.xavier_uniform(), (H, 2 * F, 1))
        a_src = a[:, :F, 0].astype(jnp.float32)   # (H, F)
        a_dst = a[:, F:, 0].astype(jnp.float32)

        use_dropout = self.attn_dropout > 0 and not deterministic
        if self.diag and not use_dropout:
            # fused-aggregation hot path.  The diag projection is
            # elementwise, so it COMMUTES out of the neighbour sum:
            #   agg_h = (sum_j e_hij x_j) * w_h
            # — edges carry only the shared (E, F) neighbour rows and the
            # narrow (E, H) attention mass, and the whole
            # gather-weight-reduce runs in ONE Pallas row-tile kernel
            # (ops/gat_agg.py; replaces the reference's 2-spmm-per-head
            # loop, layers.py:81-85).  The previous packed (E, H*F+H)
            # formulation moved ~5 GB/layer through HBM (profiled).
            from snag_tpu.ops.gat_attn_primitive import gat_attention
            wh = w[:, 0, :].astype(jnp.float32)                  # (H, F)
            # score of edge (i <- j): h_i.a_src + h_j.a_dst; with the diag
            # projection both reduce to x @ (w_h * a_h) — tiny matmuls
            s_src_nh = x.astype(jnp.float32) @ (wh * a_src).T    # (N, H)
            s_dst_nh = x.astype(jnp.float32) @ (wh * a_dst).T
            edge_dtype = (jnp.bfloat16 if self.dtype == jnp.bfloat16
                          else jnp.float32)
            agg, rowsum = gat_attention(x.astype(edge_dtype),
                                        s_src_nh, s_dst_nh, graph)
            agg = agg * wh[None, :, :]                           # (N, H, F)
            return agg / rowsum[:, :, None]

        if self.diag:
            h_nhf = (x[:, None, :].astype(self.dtype)
                     * w[:, 0, :][None, :, :].astype(self.dtype))  # (N, H, F)
        else:
            h_nhf = jnp.einsum("nf,hfo->nho", x.astype(self.dtype),
                               w.astype(self.dtype),
                               preferred_element_type=jnp.float32)
        h_nhf = h_nhf.astype(jnp.float32)
        s_src_nh = jnp.einsum("nhf,hf->nh", h_nhf, a_src)     # (N, H)
        s_dst_nh = jnp.einsum("nhf,hf->nh", h_nhf, a_dst)

        if not use_dropout:
            # non-diag scatter-free path (dense per-head projections)
            score_e = (edge_gather_row(s_src_nh, graph)
                       + edge_gather_col(s_dst_nh, graph))    # (E, H)
            e = jnp.exp(-nn.leaky_relu(score_e, negative_slope=0.2))
            e = jnp.where(mask[:, None], e, 0.0)
            gathered = edge_gather_col(h_nhf.reshape(n, H * F), graph)
            weighted = jnp.concatenate(
                [gathered[:, h * F:(h + 1) * F] * e[:, h:h + 1]
                 for h in range(H)] + [e], axis=1)
            out = segment_reduce_sorted(weighted, graph)
            agg = out[:, :H * F].reshape(n, H, F)
            rowsum = out[:, H * F:]
            return agg / rowsum[:, :, None]                   # (N, H, F)

        # general path: sorted-edge segment sums (supports attn dropout)
        h32 = h_nhf.transpose(1, 0, 2)                        # (H, N, F)
        score = s_src_nh.T[:, row] + s_dst_nh.T[:, col]       # (H, E)
        e = jnp.exp(-nn.leaky_relu(score, negative_slope=0.2))
        e = jnp.where(mask[None, :], e, 0.0)
        rowsum = jax.ops.segment_sum(e.T, row, num_segments=n,
                                     indices_are_sorted=True).T  # (H, N)
        e = nn.Dropout(self.attn_dropout)(e, deterministic=deterministic)

        weighted = e[:, :, None] * h32[:, col, :]             # (H, E, F)
        h_prime = jax.vmap(
            lambda we: jax.ops.segment_sum(we, row, num_segments=n,
                                           indices_are_sorted=True))(weighted)
        out = h_prime / (rowsum[:, :, None])
        return out.transpose(1, 0, 2)                         # (N, H, F)


class GAT(nn.Module):
    """Stacked GAT with head-mean between layers (Tool_model.py:61-110)."""
    n_units: List[int]
    n_heads: List[int]
    dropout: float = 0.0
    attn_dropout: float = 0.0
    instance_normalization: bool = False
    diag: bool = True
    dtype: jnp.dtype = jnp.float32
    adj_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, graph: Graph, *, deterministic: bool = True):
        num_layer = len(self.n_units) - 1
        if self.instance_normalization:
            # affine feature-channel normalisation standing in for torch's
            # InstanceNorm1d(momentum=0) — unused by all shipped configs.
            mean = x.mean(axis=0, keepdims=True)
            var = x.var(axis=0, keepdims=True)
            scale = self.param("in_scale", jax.nn.initializers.ones, (x.shape[1],))
            bias = self.param("in_bias", jax.nn.initializers.zeros, (x.shape[1],))
            x = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias

        for i in range(num_layer):
            f_in = self.n_units[i] * self.n_heads[i - 1] if i else self.n_units[i]
            if i + 1 < num_layer:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = MultiHeadGraphAttention(
                n_head=self.n_heads[i], f_in=f_in, f_out=self.n_units[i + 1],
                attn_dropout=self.attn_dropout, diag=self.diag,
                dtype=self.dtype, adj_dtype=self.adj_dtype, name=f"gat_{i}")(
                    x, graph, deterministic=deterministic)   # (N, H, F)
            if self.diag:
                x = x.mean(axis=1)
            if i + 1 < num_layer:
                if self.diag:
                    x = nn.elu(x)
                else:
                    x = nn.elu(x.reshape(graph.n_nodes, -1))
        if not self.diag:
            x = x.mean(axis=1)
        return x
