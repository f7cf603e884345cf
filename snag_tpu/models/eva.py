"""EVA (reference: SNAG_MMEA/model/EVA.py).

GCN structure encoder (EVA.py:52 builds GCN regardless of the flag),
xavier-normal projection inits (EVA.py:55-58), NCA losses per modality +
joint (alpha 5 for the graph view, 15 elsewhere, beta 10), and a
detached weighted-concat joint embedding (EVA.py:146-165).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.losses.contrastive import nca_loss
from snag_tpu.models.encoder import FeaturePack
from snag_tpu.ops import inits, noise as noise_ops
from snag_tpu.ops.fusion import l2norm
from snag_tpu.ops.gnn import GCN


def _xdense(features: int, ref_fan_in: int, name: str):
    # reference EVA: xavier_normal kernels (EVA.py:55-58) but the BIAS
    # keeps torch nn.Linear's default uniform(+-1/sqrt(fan_in)); rel_fc
    # sees the fixed 1000-column relation bag, so both draws use the
    # reference fan-in (ref_fan_in), not our truncated table width
    return nn.Dense(features, name=name,
                    kernel_init=inits.xavier_normal_fan(ref_fan_in),
                    bias_init=inits.torch_linear_bias(ref_fan_in))


class EVA(nn.Module):
    cfg: Config
    ent_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int

    @classmethod
    def from_data(cls, cfg: Config, data) -> "EVA":
        return cls(cfg=cfg, ent_num=data.ent_num,
                   img_feature_dim=data.img_dim,
                   attr_input_dim=int(data.att_features.shape[1]),
                   char_feature_dim=data.char_dim)

    def setup(self):
        cfg = self.cfg
        u = cfg.n_units()
        self.ent_embed = self.param("ent_embed", inits.xavier_normal(),
                                    (self.ent_num, u[0]))
        self.weight_raw = self.param("weight_raw", nn.initializers.ones,
                                     (cfg.inner_view_num,))
        self.rel_fc = _xdense(cfg.attr_dim, 1000, "rel_fc")
        self.att_fc = _xdense(cfg.attr_dim, self.attr_input_dim, "att_fc")
        self.img_fc = _xdense(cfg.attr_dim, self.img_feature_dim, "img_fc")
        self.cross_graph_model = GCN(u[0], u[1], u[2], dropout=cfg.dropout)
        if cfg.w_name and cfg.w_char:
            self.name_fc = _xdense(cfg.char_dim, 300, "name_fc")
            self.char_fc = _xdense(cfg.char_dim, self.char_feature_dim,
                                   "char_fc")

    def _embs(self, feats: FeaturePack, graph: Graph,
              entity_noise_key: Optional[jax.Array], deterministic: bool,
              rows=None):
        cfg = self.cfg
        ent = self.ent_embed
        if entity_noise_key is not None:
            ent = noise_ops.entity_noise(entity_noise_key, ent,
                                         cfg.noise_ratio, cfg.mask_ratio)
        gph = self.cross_graph_model(ent, graph, deterministic=deterministic)
        if rows is not None:   # batch-subset encoding (see encoder.py doc)
            gph = gph[rows]

        def sel(t):
            return t if rows is None else t[rows]

        img = self.img_fc(sel(feats.img))
        rel = self.rel_fc(sel(feats.rel))
        att = self.att_fc(sel(feats.att))
        name = char = None
        if cfg.w_name and cfg.w_char and feats.name is not None:
            name = self.name_fc(sel(feats.name))
            char = self.char_fc(sel(feats.char))
        return gph, img, rel, att, name, char

    def _joint(self, gph, img, rel, att, name, char):
        """Detached weighted concat, order img/att/rel/gph[/name/char]
        (EVA.py:146-165)."""
        w = jax.nn.softmax(self.weight_raw, axis=0)
        parts = [w[0] * jax.lax.stop_gradient(l2norm(img)),
                 w[1] * jax.lax.stop_gradient(l2norm(att)),
                 w[2] * jax.lax.stop_gradient(l2norm(rel)),
                 w[3] * jax.lax.stop_gradient(l2norm(gph))]
        if name is not None:
            parts.append(w[4] * jax.lax.stop_gradient(l2norm(name)))
            parts.append(w[5] * jax.lax.stop_gradient(l2norm(char)))
        return jnp.concatenate(parts, axis=1)

    def __call__(self, links, valid, feats: FeaturePack, graph: Graph,
                 entity_noise_key: Optional[jax.Array] = None,
                 deterministic: bool = False):
        rows = None
        if getattr(self.cfg, "batch_encode", 0):
            from snag_tpu.models.encoder import batch_rows
            rows, links = batch_rows(links)
        gph, img, rel, att, name, char = self._embs(
            feats, graph, entity_noise_key, deterministic, rows=rows)
        joint = self._joint(gph, img, rel, att, name, char)

        loss_gcn = nca_loss(gph, links, alpha=5, beta=10, valid=valid)
        loss_rel = nca_loss(rel, links, alpha=15, beta=10, valid=valid)
        loss_att = nca_loss(att, links, alpha=15, beta=10, valid=valid)
        loss_img = nca_loss(img, links, alpha=15, beta=10, valid=valid)
        loss_joi = nca_loss(joint, links, alpha=15, beta=10, valid=valid)
        loss_all = loss_joi + loss_att + loss_rel + loss_gcn + loss_img
        aux = {"gcn": loss_gcn, "rel": loss_rel, "att": loss_att,
               "img": loss_img, "joi": loss_joi}
        if name is not None:
            loss_name = nca_loss(name, links, alpha=15, beta=10, valid=valid)
            loss_char = nca_loss(char, links, alpha=15, beta=10, valid=valid)
            loss_all = loss_all + loss_name + loss_char
            aux.update({"name": loss_name, "char": loss_char})
        aux["weight_norm"] = jax.lax.stop_gradient(
            jax.nn.softmax(self.weight_raw, axis=0))
        return loss_all, aux

    def joint_emb(self, feats: FeaturePack, graph: Graph):
        gph, img, rel, att, name, char = self._embs(feats, graph, None, True)
        joint = self._joint(gph, img, rel, att, name, char)
        return joint, jax.nn.softmax(self.weight_raw, axis=0)
