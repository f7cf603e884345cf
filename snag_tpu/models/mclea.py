"""MCLEA (reference: SNAG_MMEA/model/MCLEA.py).

Mean fusion with global learnable softmax weights (MCLEA_tools.py:20-38);
loss = joint ICL + per-modality ICL (Kendall) + IAL KL alignment (second
Kendall, scaled by zoom — on top of the zoom already inside ial_loss,
faithfully double-applied as in MCLEA.py:128-139).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.losses.contrastive import ial_loss, icl_loss
from snag_tpu.losses.multitask import KendallLossLayer
from snag_tpu.models.encoder import FeaturePack, MultiModalEncoder


class MCLEA(nn.Module):
    cfg: Config
    ent_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int

    @classmethod
    def from_data(cls, cfg: Config, data) -> "MCLEA":
        return cls(cfg=cfg, ent_num=data.ent_num,
                   img_feature_dim=data.img_dim,
                   attr_input_dim=int(data.att_features.shape[1]),
                   char_feature_dim=data.char_dim)

    def setup(self):
        self.multimodal_encoder = MultiModalEncoder(
            cfg=self.cfg, ent_num=self.ent_num,
            img_feature_dim=self.img_feature_dim,
            attr_input_dim=self.attr_input_dim,
            char_feature_dim=self.char_feature_dim,
            fusion_kind="mean")
        self.multi_loss_layer = KendallLossLayer(loss_num=6)
        self.align_multi_loss_layer = KendallLossLayer(loss_num=6)

    def _modal_dict(self, enc):
        return {"gph": enc.gph, "rel": enc.rel, "att": enc.att,
                "img": enc.img, "name": enc.name, "char": enc.char}

    def __call__(self, links, valid, feats: FeaturePack, graph: Graph,
                 entity_noise_key: Optional[jax.Array] = None,
                 deterministic: bool = False):
        cfg = self.cfg
        rows = None
        if getattr(cfg, "batch_encode", 0):
            from snag_tpu.models.encoder import batch_rows
            rows, links = batch_rows(links)
        enc = self.multimodal_encoder(feats, graph, entity_noise_key,
                                      deterministic=deterministic, rows=rows)
        modal = self._modal_dict(enc)

        loss_joi = icl_loss(enc.joint, links, tau=cfg.tau,
                            ab_weight=cfg.ab_weight, valid=valid)

        order = ("gph", "rel", "att", "img", "name", "char")
        in_losses = [
            icl_loss(modal[m], links, tau=cfg.tau, ab_weight=cfg.ab_weight,
                     valid=valid) if modal[m] is not None else 0.0
            for m in order
        ]
        in_loss = self.multi_loss_layer(in_losses)

        align_losses = [
            ial_loss(modal[m], enc.joint, links, tau=cfg.tau2,
                     ab_weight=cfg.ab_weight, zoom=cfg.zoom,
                     reduction=cfg.reduction, valid=valid)
            if modal[m] is not None else 0.0
            for m in order
        ]
        align_loss = self.align_multi_loss_layer(align_losses) * cfg.zoom

        loss_all = loss_joi + in_loss + align_loss
        aux = {"joint_Intra_modal": loss_joi, "Intra_modal": in_loss,
               "Inter_modal": align_loss}
        return loss_all, aux

    def joint_emb(self, feats: FeaturePack, graph: Graph):
        enc = self.multimodal_encoder(feats, graph, None, deterministic=True)
        return enc.joint, None
