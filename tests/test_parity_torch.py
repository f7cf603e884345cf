"""Golden parity: our JAX ops vs torch implementations of the reference
math, with identical weights injected.

Each torch model here is written from the published equations (sparse GAT a
la Velickovic with exp(-leakyrelu) attention, Kipf GCN, post-LN BERT layer)
— the same math the reference uses — so agreement demonstrates formula
fidelity without copying reference code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF
import jax
import jax.numpy as jnp

from snag_tpu.data.graph import build_graph
from snag_tpu.ops.fusion import BertLayer
from snag_tpu.ops.gnn import GCN, MultiHeadGraphAttention

torch.manual_seed(0)


def _graph(n=15, n_edges=50, seed=0):
    rng = np.random.default_rng(seed)
    triples = [(int(rng.integers(0, n)), 0, int(rng.integers(0, n)))
               for _ in range(n_edges)]
    return build_graph(n, triples, pad_multiple=8)


def test_gat_layer_parity():
    n, f, heads = 15, 8, 2
    g = _graph(n)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(heads, 1, f)).astype(np.float32)
    a = rng.normal(size=(heads, 2 * f, 1)).astype(np.float32) * 0.2

    # torch dense-edge implementation of the diag sparse-GAT equations
    xt = torch.tensor(x)
    rows = torch.tensor(g.row[g.mask].astype(np.int64))
    cols = torch.tensor(g.col[g.mask].astype(np.int64))
    outs = []
    for h_i in range(heads):
        h = xt * torch.tensor(w[h_i, 0])
        edge_h = torch.cat([h[rows], h[cols]], dim=1)
        e = torch.exp(-tF.leaky_relu(edge_h @ torch.tensor(a[h_i]), 0.2)).squeeze(1)
        rowsum = torch.zeros(n).index_add_(0, rows, e)
        hp = torch.zeros(n, f).index_add_(0, rows, e.unsqueeze(1) * h[cols])
        outs.append((hp / rowsum.unsqueeze(1)).numpy())
    want = np.stack(outs)

    import jax.numpy as _jnp
    layer = MultiHeadGraphAttention(n_head=heads, f_in=f, f_out=f, diag=True,
                                    adj_dtype=_jnp.float32)
    params = {"params": {"w": jnp.asarray(w), "a_src_dst": jnp.asarray(a)}}
    got = np.asarray(layer.apply(params, jnp.asarray(x), g))
    got = got.transpose(1, 0, 2)   # layer returns (N, H, F)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gcn_parity():
    n, fin, fh, fo = 15, 6, 5, 4
    g = _graph(n, seed=2)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n, fin)).astype(np.float32)
    w1 = rng.normal(size=(fin, fh)).astype(np.float32)
    b1 = rng.normal(size=(fh,)).astype(np.float32)
    w2 = rng.normal(size=(fh, fo)).astype(np.float32)
    b2 = rng.normal(size=(fo,)).astype(np.float32)

    adj = np.zeros((n, n), dtype=np.float64)
    np.add.at(adj, (g.row[g.mask], g.col[g.mask]), g.w[g.mask])
    adj_t = torch.tensor(adj, dtype=torch.float32)
    h = torch.relu(adj_t @ (torch.tensor(x) @ torch.tensor(w1)) + torch.tensor(b1))
    want = (adj_t @ (h @ torch.tensor(w2)) + torch.tensor(b2)).numpy()

    gcn = GCN(nfeat=fin, nhid=fh, nout=fo, dropout=0.0,
              adj_dtype=jnp.float32)
    params = {"params": {
        "gc1": {"weight": jnp.asarray(w1), "bias": jnp.asarray(b1)},
        "gc2": {"weight": jnp.asarray(w2), "bias": jnp.asarray(b2)},
    }}
    got = np.asarray(gcn.apply(params, jnp.asarray(x), g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bert_layer_parity():
    """Post-LN transformer block vs a torch build with the same weights
    (dropout off => deterministic)."""
    n, m, d, heads, inter = 7, 4, 16, 2, 32
    rng = np.random.default_rng(4)
    x = rng.normal(size=(n, m, d)).astype(np.float32)

    names = ["q", "k", "v", "ao", "int", "out"]
    dims = {"q": (d, d), "k": (d, d), "v": (d, d), "ao": (d, d),
            "int": (d, inter), "out": (inter, d)}
    W = {k: rng.normal(size=dims[k]).astype(np.float32) * 0.1 for k in names}
    B = {k: rng.normal(size=(dims[k][1],)).astype(np.float32) * 0.1 for k in names}
    ln1_w = rng.normal(size=(d,)).astype(np.float32)
    ln1_b = rng.normal(size=(d,)).astype(np.float32) * 0.1
    ln2_w = rng.normal(size=(d,)).astype(np.float32)
    ln2_b = rng.normal(size=(d,)).astype(np.float32) * 0.1

    # torch forward (BERT post-LN, eps 1e-12, gelu exact)
    xt = torch.tensor(x)
    def lin(k, v):
        return v @ torch.tensor(W[k]) + torch.tensor(B[k])
    q = lin("q", xt).reshape(n, m, heads, d // heads).permute(0, 2, 1, 3)
    kk = lin("k", xt).reshape(n, m, heads, d // heads).permute(0, 2, 1, 3)
    v = lin("v", xt).reshape(n, m, heads, d // heads).permute(0, 2, 1, 3)
    att = torch.softmax(q @ kk.transpose(-1, -2) / np.sqrt(d // heads), dim=-1)
    ctx = (att @ v).permute(0, 2, 1, 3).reshape(n, m, d)
    attn_out = tF.layer_norm(lin("ao", ctx) + xt, (d,),
                             torch.tensor(ln1_w), torch.tensor(ln1_b), 1e-12)
    inter_out = tF.gelu(lin("int", attn_out))
    want = tF.layer_norm(lin("out", inter_out) + attn_out, (d,),
                         torch.tensor(ln2_w), torch.tensor(ln2_b), 1e-12).numpy()
    want_att = att.numpy()

    layer = BertLayer(hidden_size=d, num_heads=heads, intermediate_size=inter,
                      use_intermediate=True)
    params = {"params": {
        "self": {"query": {"kernel": jnp.asarray(W["q"]), "bias": jnp.asarray(B["q"])},
                 "key": {"kernel": jnp.asarray(W["k"]), "bias": jnp.asarray(B["k"])},
                 "value": {"kernel": jnp.asarray(W["v"]), "bias": jnp.asarray(B["v"])}},
        "att_out": {"kernel": jnp.asarray(W["ao"]), "bias": jnp.asarray(B["ao"])},
        "att_ln": {"scale": jnp.asarray(ln1_w), "bias": jnp.asarray(ln1_b)},
        "intermediate": {"kernel": jnp.asarray(W["int"]), "bias": jnp.asarray(B["int"])},
        "output": {"kernel": jnp.asarray(W["out"]), "bias": jnp.asarray(B["out"])},
        "out_ln": {"scale": jnp.asarray(ln2_w), "bias": jnp.asarray(ln2_b)},
    }}
    got, got_att = layer.apply(params, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_att), want_att, rtol=1e-4, atol=1e-5)
