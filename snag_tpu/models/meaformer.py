"""MEAformer (reference: SNAG_MMEA/model/MEAformer.py).

Same Mformer trunk as SNAG but a single joint path (no frozen-weight head,
MEAformer_tools.py:25-72), cursor-based presence-aware hidden slicing
(MEAformer.py:168-202), and the optional *replay* strategy: the hardest
in-batch negative per anchor is mined inside softXEnt
(MEAformer_loss.py:40-68), stored per entity, and replayed as extra
negatives once the replay matrix stops growing (MEAformer.py:55-61,
108-148).

Replay state lives in the train loop as a fixed-shape (N,) int array;
the set-difference filtering of the reference (negatives already in the
batch are dropped) becomes a validity mask.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.losses.contrastive import icl_loss
from snag_tpu.losses.multitask import KendallLossLayer
from snag_tpu.models.encoder import FeaturePack, MultiModalEncoder
from snag_tpu.ops.fusion import l2norm


class MEAformer(nn.Module):
    cfg: Config
    ent_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int

    @classmethod
    def from_data(cls, cfg: Config, data) -> "MEAformer":
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
            fusion_kind="mformer_single")
        self.multi_loss_layer = KendallLossLayer(loss_num=6)

    def generate_hidden_emb(self, hidden: jnp.ndarray):
        """Cursor-based slicing (MEAformer.py:168-202): tokens are consumed
        in gph, rel, att, img order of *present* modalities."""
        cfg = self.cfg
        i = 0
        out = {}
        for m, flag in (("gph", cfg.w_gcn), ("rel", cfg.w_rel),
                        ("att", cfg.w_attr), ("img", cfg.w_img)):
            if flag:
                out[m] = l2norm(hidden[:, i, :])
                i += 1
            else:
                out[m] = None
        if cfg.w_name and cfg.w_char:
            out["name"] = l2norm(hidden[:, i, :])
            out["char"] = l2norm(hidden[:, i + 1, :])
        else:
            out["name"] = out["char"] = None
        return out

    def _matmul_dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else None

    def inner_view_loss(self, embs: dict, links, valid):
        cfg = self.cfg
        order = ("gph", "rel", "att", "img", "name", "char")
        active = [(m, embs[m]) for m in order if embs[m] is not None]
        dims = {e.shape[-1] for _, e in active}
        if len(dims) == 1:
            # one batched einsum for all modalities (see SNAG.inner_view_loss)
            from snag_tpu.losses.contrastive import icl_loss_multi
            from snag_tpu.ops.fusion import l2norm
            stack = jnp.stack([l2norm(e) for _, e in active], axis=0)
            per = icl_loss_multi(stack, links, tau=cfg.tau,
                                 ab_weight=cfg.ab_weight, valid=valid,
                                 matmul_dtype=self._matmul_dtype())
            it = iter(range(len(active)))
            losses = [per[next(it)] if embs[m] is not None else 0.0
                      for m in order]
            return self.multi_loss_layer(losses)
        losses = [
            icl_loss(embs[m], links, tau=cfg.tau, ab_weight=cfg.ab_weight,
                     valid=valid) if embs[m] is not None else 0.0
            for m in order
        ]
        return self.multi_loss_layer(losses)

    def __call__(self, links, valid, feats: FeaturePack, graph: Graph,
                 entity_noise_key: Optional[jax.Array] = None,
                 deterministic: bool = False,
                 replay_neg_l: Optional[jnp.ndarray] = None,
                 replay_neg_r: Optional[jnp.ndarray] = None,
                 replay_neg_valid: Optional[jnp.ndarray] = None,
                 replay_neg_valid_r: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        rows = None
        if getattr(cfg, "batch_encode", 0) and not cfg.replay:
            # replay negatives index arbitrary entities -> full table then
            from snag_tpu.models.encoder import batch_rows
            rows, links = batch_rows(links)
        enc = self.multimodal_encoder(feats, graph, entity_noise_key,
                                      deterministic=deterministic, rows=rows)
        hid = self.generate_hidden_emb(enc.hidden)

        nck = bool(cfg.neg_cross_kg)   # inert, as in reference MEAformer.py:51
        if cfg.replay:
            loss_joi, l_neg, r_neg = icl_loss(
                enc.joint, links, tau=cfg.tau, ab_weight=cfg.ab_weight,
                valid=valid, neg_l=replay_neg_l, neg_r=replay_neg_r,
                neg_valid=replay_neg_valid, neg_valid_r=replay_neg_valid_r,
                with_replay_mining=True, neg_cross_kg=nck)
        else:
            loss_joi = icl_loss(enc.joint, links, tau=cfg.tau,
                                ab_weight=cfg.ab_weight, valid=valid,
                                matmul_dtype=self._matmul_dtype(),
                                neg_cross_kg=nck)
            l_neg = r_neg = None

        modal = {"gph": enc.gph, "rel": enc.rel, "att": enc.att,
                 "img": enc.img, "name": enc.name, "char": enc.char}
        in_loss = self.inner_view_loss(modal, links, valid)
        out_loss = self.inner_view_loss(hid, links, valid)
        loss_all = loss_joi + in_loss + out_loss

        aux = {"joint_Intra_modal": loss_joi, "Intra_modal": in_loss,
               "IIR_loss": out_loss,
               "weight_norm": jax.lax.stop_gradient(enc.weight_norm.mean(axis=0))}
        if l_neg is not None:
            aux["l_neg"] = l_neg
            aux["r_neg"] = r_neg
        return loss_all, aux

    def joint_emb(self, feats: FeaturePack, graph: Graph):
        enc = self.multimodal_encoder(feats, graph, None, deterministic=True)
        return enc.joint, enc.weight_norm
