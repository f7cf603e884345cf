"""MSNEA (reference: SNAG_MMEA/model/MSNEA.py, MSNEA_tools.py, MSNEA_loss.py).

Divergent path among the five models: TransE margin losses over relation
triples in both the structural and image space (MSNEA.py:108-132) plus
pairwise contrastive losses on four B x B score matrices vs the identity
(MSNEA.py:99-102, MSNEA_loss.py:9-17 — note the reference forward ignores
its constructor margin and uses the default-arg 2.0; reproduced).

The reference samples negative triples on the host with multiprocessing and
rejection (MSNEA_tools.py:37-90).  Here sampling is vectorized
``jax.random`` corruption on device over padded per-KG triple/entity arrays
(``sample_triple_batch``); the existing-triple rejection test is dropped —
with 15K+ entities the collision probability is negligible and the expected
gradient is unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.models.encoder import FeaturePack
from snag_tpu.ops import inits
from snag_tpu.ops.fusion import l2norm, _tdense


class TripleBank(NamedTuple):
    """Padded per-KG triple and entity id banks for device-side sampling."""
    h1: jnp.ndarray
    r1: jnp.ndarray
    t1: jnp.ndarray
    n1: int            # real triple count in KG1
    h2: jnp.ndarray
    r2: jnp.ndarray
    t2: jnp.ndarray
    n2: int
    ents1: jnp.ndarray
    ents2: jnp.ndarray

    @staticmethod
    def from_data(data) -> "TripleBank":
        a1 = np.asarray(data.kg1_triples, dtype=np.int32)
        a2 = np.asarray(data.kg2_triples, dtype=np.int32)
        return TripleBank(
            h1=jnp.asarray(a1[:, 0]), r1=jnp.asarray(a1[:, 1]), t1=jnp.asarray(a1[:, 2]),
            n1=len(a1),
            h2=jnp.asarray(a2[:, 0]), r2=jnp.asarray(a2[:, 1]), t2=jnp.asarray(a2[:, 2]),
            n2=len(a2),
            ents1=jnp.asarray(np.asarray(data.kg1_entities, dtype=np.int32)),
            ents2=jnp.asarray(np.asarray(data.kg2_entities, dtype=np.int32)),
        )


jax.tree_util.register_pytree_node(
    TripleBank,
    lambda b: ((b.h1, b.r1, b.t1, b.h2, b.r2, b.t2, b.ents1, b.ents2),
               (b.n1, b.n2)),
    lambda aux, l: TripleBank(h1=l[0], r1=l[1], t1=l[2], n1=aux[0],
                              h2=l[3], r2=l[4], t2=l[5], n2=aux[1],
                              ents1=l[6], ents2=l[7]),
)


def sample_triple_batch(key: jax.Array, bank: TripleBank, batch_size: int,
                        step: jnp.ndarray, neg_num: int):
    """Sequential positive slices per KG (sizes proportional to KG triple
    counts, MSNEA_tools.py:40-57 — wraps around instead of truncating) +
    uniform head/tail corruption negatives (generate_neg_triples_fast)."""
    bs1 = int(bank.n1 / (bank.n1 + bank.n2) * batch_size)
    bs2 = batch_size - bs1

    def pos_slice(h, r, t, n, bs, salt):
        start = (step * bs) % n
        idx = (start + jnp.arange(bs)) % n
        return h[idx], r[idx], t[idx]

    p1 = pos_slice(bank.h1, bank.r1, bank.t1, bank.n1, bs1, 0)
    p2 = pos_slice(bank.h2, bank.r2, bank.t2, bank.n2, bs2, 1)
    pos_h = jnp.concatenate([p1[0], p2[0]])
    pos_r = jnp.concatenate([p1[1], p2[1]])
    pos_t = jnp.concatenate([p1[2], p2[2]])

    def corrupt(key, h, r, t, ents, bs):
        k1, k2, k3 = jax.random.split(key, 3)
        h = jnp.repeat(h, neg_num)
        r = jnp.repeat(r, neg_num)
        t = jnp.repeat(t, neg_num)
        corrupt_head = jax.random.bernoulli(k1, 0.5, (bs * neg_num,))
        rand_ent = ents[jax.random.randint(k2, (bs * neg_num,), 0, ents.shape[0])]
        nh = jnp.where(corrupt_head, rand_ent, h)
        nt = jnp.where(corrupt_head, t, rand_ent)
        return nh, r, nt

    k1, k2 = jax.random.split(key)
    n1 = corrupt(k1, p1[0], p1[1], p1[2], bank.ents1, bs1)
    n2 = corrupt(k2, p2[0], p2[1], p2[2], bank.ents2, bs2)
    neg_h = jnp.concatenate([n1[0], n2[0]])
    neg_r = jnp.concatenate([n1[1], n2[1]])
    neg_t = jnp.concatenate([n1[2], n2[2]])
    return (pos_h, pos_r, pos_t), (neg_h, neg_r, neg_t)


def contrastive_loss(dis: jnp.ndarray, label: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None,
                     margin: float = 2.0) -> jnp.ndarray:
    """MSNEA_loss.py:9-17."""
    elem = (1 - label) * dis ** 2 + label * jnp.maximum(margin - dis, 0.0) ** 2
    if valid is None:
        return elem.mean()
    vm = valid.astype(dis.dtype)
    elem = elem * vm[:, None] * vm[None, :]
    denom = jnp.maximum(valid.sum() ** 2, 1)
    return elem.sum() / denom


class AttrEncoder(nn.Module):
    """MSNEA_tools.py:16-35 (the vision-adaptive path is commented out in
    the reference; only fc1 over the attribute bag is live)."""
    attr_input_dim: int
    dim: int

    @nn.compact
    def __call__(self, att_rows):
        fc1 = nn.Dense(self.dim, name="fc1", kernel_init=inits.xavier_normal(),
                       bias_init=nn.initializers.zeros)
        return fc1(att_rows)


class MSNEA(nn.Module):
    cfg: Config
    ent_num: int
    rel_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int

    @classmethod
    def from_data(cls, cfg: Config, data) -> "MSNEA":
        return cls(cfg=cfg, ent_num=data.ent_num, rel_num=data.rel_num,
                   img_feature_dim=data.img_dim,
                   attr_input_dim=int(data.att_features.shape[1]),
                   char_feature_dim=data.char_dim)

    def setup(self):
        cfg = self.cfg
        self.ent_embed = self.param("ent_embed", inits.xavier_normal(),
                                    (self.ent_num, cfg.dim))
        self.rel_embed = self.param("rel_embed", inits.xavier_normal(),
                                    (self.rel_num, cfg.dim))
        self.fc1 = nn.Dense(cfg.dim, name="fc1", kernel_init=inits.xavier_normal(),
                            bias_init=nn.initializers.zeros)
        self.fc3 = nn.Dense(cfg.dim, name="fc3", kernel_init=inits.xavier_normal(),
                            bias_init=nn.initializers.zeros)
        self.attr_encoder = AttrEncoder(self.attr_input_dim, cfg.dim)
        if cfg.w_char and cfg.w_name:
            self.name_fc = _tdense(cfg.char_dim, 300, "name_fc")
            self.char_fc = _tdense(cfg.char_dim, self.char_feature_dim, "char_fc")

    def r_rep(self, e):
        return l2norm(self.ent_embed[e])

    def i_rep(self, feats, e):
        return l2norm(self.fc1(feats.img[e]))

    def i_w(self, feats, e):
        return l2norm(self.fc3(feats.img[e]))

    def _emb_generate(self, feats: FeaturePack, idx):
        cfg = self.cfg
        img = self.i_rep(feats, idx) if cfg.w_img else None
        rel = self.r_rep(idx) if cfg.w_rel else None
        att = self.attr_encoder(feats.att[idx]) if (cfg.w_attr and cfg.w_img) else None
        name = self.name_fc(feats.name[idx]) if (cfg.w_name and feats.name is not None) else None
        char = self.char_fc(feats.char[idx]) if (cfg.w_char and feats.char is not None) else None
        return img, rel, att, name, char

    def _fusion(self, embs):
        parts = [l2norm(e) for e in embs if e is not None]
        return l2norm(jnp.concatenate(parts, axis=1))

    def __call__(self, links, valid, feats: FeaturePack, graph: Graph,
                 pos_triples=None, neg_triples=None,
                 entity_noise_key=None, deterministic: bool = False):
        cfg = self.cfg
        p_h, p_r, p_t = pos_triples
        n_h, n_r, n_t = neg_triples

        def transe(rep):
            rph, rpr, rpt = rep(p_h), l2norm(self.rel_embed[p_r]), rep(p_t)
            rnh, rnr, rnt = rep(n_h), l2norm(self.rel_embed[n_r]), rep(n_t)
            pos = jnp.sum(jnp.square(rph + rpr - rpt), axis=1)
            neg = jnp.sum(jnp.square(rnh + rnr - rnt), axis=1)
            pos = jnp.repeat(pos, n_h.shape[0] // p_h.shape[0])
            return jnp.sum(jax.nn.relu(cfg.margin + pos - neg))

        r_loss = transe(self.r_rep) + transe(lambda e: self.i_w(feats, e))

        e1, e2 = links[:, 0], links[:, 1]
        i1, r1, a1, nm1, ch1 = self._emb_generate(feats, e1)
        i2, r2, a2, nm2, ch2 = self._emb_generate(feats, e2)
        all1 = self._fusion([r1, i1, a1, nm1, ch1])
        all2 = self._fusion([r2, i2, a2, nm2, ch2])

        label = jnp.eye(links.shape[0], dtype=all1.dtype)
        score = all1 @ all2.T
        rs = r1 @ r2.T
        ats = a1 @ a2.T
        ims = i1 @ i2.T
        align = (contrastive_loss(score, label, valid)
                 + contrastive_loss(rs, label, valid)
                 + contrastive_loss(ats, label, valid)
                 + contrastive_loss(ims, label, valid))

        loss = r_loss + align
        return loss, {"kge": r_loss, "align": align}

    def joint_emb(self, feats: FeaturePack, graph: Graph):
        idx = jnp.arange(self.ent_num)
        img, rel, att, name, char = self._emb_generate(feats, idx)
        # fusion input order rel, img, att (MSNEA.py:joint_emb_generat)
        return self._fusion([rel, img, att, name, char]), None
