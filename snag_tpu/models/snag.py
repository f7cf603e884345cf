"""SNAG — the paper's model (reference: SNAG_MMEA/model/SNAG.py).

Loss bundle (SNAG.py:101-122):
* GMI  — ICL on both joint paths (attention-weighted + frozen-weight);
* ECIA — per-modality ICL weighted by each entity-pair's min attention
  weight (SNAG.py:109, 143-162; SNAG_loss.py:65-71);
* IIR  — per-modality ICL on the post-transformer hidden slices
  (SNAG.py:112, 124-141; the slice labels follow the reference's hardcoded
  index order, including its gph/img swap vs. the fusion input order).

Each bundle runs through a Kendall multi-task layer; an optional AWL head
combines the three (``--awloss``).  Eval embeds with the frozen-weight joint
path (SNAG.py:178-179).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.losses.contrastive import icl_loss
from snag_tpu.losses.multitask import AutomaticWeightedLoss, KendallLossLayer
from snag_tpu.models.encoder import (FeaturePack, MultiModalEncoder,
                                     batch_rows)
from snag_tpu.ops.fusion import l2norm

# fusion input order (SNAG_tools.py:154)
FUSION_ORDER = ("img", "att", "rel", "gph", "name", "char")


def weight_column(cfg: Config, modality: str) -> Optional[int]:
    """Column of ``weight_norm`` holding `modality`'s attention weight.

    weight_norm columns follow the *active* fusion-input order; this mapping
    reduces to the reference's hardcoded indices (SNAG.py:147-152) for every
    shippable config."""
    active = [m for m in FUSION_ORDER
              if {"img": cfg.w_img, "att": cfg.w_attr, "rel": cfg.w_rel,
                  "gph": cfg.w_gcn, "name": cfg.w_name, "char": cfg.w_char}[m]]
    return active.index(modality) if modality in active else None


class SNAG(nn.Module):
    cfg: Config
    ent_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int

    @classmethod
    def from_data(cls, cfg: Config, data) -> "SNAG":
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
            fusion_kind="mformer")
        self.multi_loss_layer = KendallLossLayer(loss_num=6)
        self.multi_loss_layer_2 = AutomaticWeightedLoss(num=7)

    def generate_hidden_emb(self, hidden: jnp.ndarray):
        """Fixed-slice extraction (SNAG.py:124-141)."""
        cfg = self.cfg
        gph = l2norm(hidden[:, 0, :])
        rel = l2norm(hidden[:, 1, :])
        att = l2norm(hidden[:, 2, :])
        img = l2norm(hidden[:, 3, :]) if cfg.w_img else None
        if hidden.shape[1] >= 6:
            name = l2norm(hidden[:, 4, :])
            char = l2norm(hidden[:, 5, :])
        else:
            name = char = None
        return gph, rel, att, img, name, char

    def _matmul_dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else None

    def inner_view_loss(self, gph, rel, att, img, name, char, links, valid,
                        weight_norm=None):
        """Per-modality ICL through the Kendall layer (SNAG.py:143-162).

        All active modalities share the hidden width in every shippable
        config, so the six B x B matmul chains are computed as ONE batched
        einsum (losses/contrastive.icl_loss_multi); falls back to the
        sequential path on heterogeneous widths."""
        cfg = self.cfg
        named = [("gph", gph), ("rel", rel), ("att", att), ("img", img),
                 ("name", name), ("char", char)]
        active = [(m, e) for m, e in named if e is not None]
        dims = {e.shape[-1] for _, e in active}

        if len(dims) == 1:
            from snag_tpu.losses.contrastive import icl_loss_multi
            stack = jnp.stack([l2norm(e) for _, e in active], axis=0)
            w_min = None
            if weight_norm is not None:
                # weight_norm: (N_ent, mod_num) per-entity attention weights
                mod_num = weight_norm.shape[1]
                cols = jnp.asarray([weight_column(cfg, m) for m, _ in active])
                wi = weight_norm[links[:, 0]][:, cols].T       # (M, B)
                wj = weight_norm[links[:, 1]][:, cols].T
                w_min = jnp.minimum(wi, wj) * mod_num
            per = icl_loss_multi(stack, links, tau=cfg.tau,
                                 ab_weight=cfg.ab_weight, w_min=w_min,
                                 valid=valid, matmul_dtype=self._matmul_dtype())
            losses = []
            k = 0
            for m, e in named:
                if e is None:
                    losses.append(0.0)
                else:
                    losses.append(per[k])
                    k += 1
            return self.multi_loss_layer(losses)

        def one(emb, modality):
            if emb is None:
                return 0.0
            w = None
            if weight_norm is not None:
                col = weight_column(cfg, modality)
                if col is not None:
                    # reference scales weights by mod_num (SNAG.py:146)
                    w = weight_norm[:, col] * weight_norm.shape[1]
            return icl_loss(emb, links, tau=cfg.tau, ab_weight=cfg.ab_weight,
                            weight_norm=w, valid=valid,
                            matmul_dtype=self._matmul_dtype())

        losses = [one(e, m) for m, e in named]
        return self.multi_loss_layer(losses)

    def _fused_bundle(self, enc, links, valid):
        """GMI + ECIA from the shared per-modality similarity blocks.

        SNAG's two joint similarities factor over the SAME per-modality
        blocks ECIA computes (the joint embedding is a weighted concat of
        unit modality rows, ops/fusion.py:213-226), so one streaming pass
        yields all M+2 NT-Xent channels — the (B, M*d) joint matmul chains
        never run (ops/pallas/snag_loss_kernel.py; matches SNAG.py:106 +
        143-162 exactly, up to fp, assuming no all-zero modality rows).
        Returns (gmi, ecia) or None when the factorization doesn't apply.
        """
        cfg = self.cfg
        if (not getattr(cfg, "fused_snag_loss", 1)
                or enc.weight_norm is None or enc.weight_fz is None):
            return None
        named = [("gph", enc.gph), ("rel", enc.rel), ("att", enc.att),
                 ("img", enc.img), ("name", enc.name), ("char", enc.char)]
        active = [(m, e) for m, e in named if e is not None]
        if len({e.shape[-1] for _, e in active}) != 1:
            return None
        from snag_tpu.losses.contrastive import snag_bundle_losses
        md = self._matmul_dtype()
        stack = jnp.stack([l2norm(e) for _, e in active], axis=0)
        zis = stack[:, links[:, 0], :]
        zjs = stack[:, links[:, 1], :]
        if md is not None:
            zis = zis.astype(md)
            zjs = zjs.astype(md)
        mod_num = enc.weight_norm.shape[1]
        cols = jnp.asarray([weight_column(cfg, m) for m, _ in active])
        wi = enc.weight_norm[links[:, 0]][:, cols]           # (B, M)
        wj = enc.weight_norm[links[:, 1]][:, cols]
        w_min = (jnp.minimum(wi, wj) * mod_num).T            # (M, B)
        # mixture coefficients: a = w / ||w||, beta = u^2 / sum u^2
        # (joint rows are unit modality rows scaled by these weights)
        a_i = wi / jnp.linalg.norm(wi, axis=1, keepdims=True)
        a_j = wj / jnp.linalg.norm(wj, axis=1, keepdims=True)
        u = enc.weight_fz[cols]
        beta = u * u / jnp.sum(u * u)
        per = snag_bundle_losses(zis, zjs, a_i, a_j, beta, w_min=w_min,
                                 valid=valid, tau=cfg.tau,
                                 ab_weight=cfg.ab_weight)
        m_act = len(active)
        gmi = per[m_act] + per[m_act + 1]
        losses = []
        k = 0
        for m, e in named:
            if e is None:
                losses.append(0.0)
            else:
                losses.append(per[k])
                k += 1
        return gmi, self.multi_loss_layer(losses)

    def __call__(self, links, valid, feats: FeaturePack, graph: Graph,
                 entity_noise_key: Optional[jax.Array] = None,
                 deterministic: bool = False):
        cfg = self.cfg
        rows = None
        if getattr(cfg, "batch_encode", 0):
            # per-entity stages run on the batch's rows only (encoder doc)
            rows, links = batch_rows(links)
        enc = self.multimodal_encoder(feats, graph, entity_noise_key,
                                      deterministic=deterministic, rows=rows)
        # materialize encoder outputs once before the loss bundle reads
        # them through many consumers (gathers per modality, both joint
        # paths, hidden slices) — without the barrier XLA re-fuses pieces
        # of the encoder into each consumer (same pathology as the
        # modal-embedding barrier in encoder.py, profiled separately)
        present = [e for e in enc if e is not None]
        barred = iter(jax.lax.optimization_barrier(present))
        enc = type(enc)(*(next(barred) if e is not None else None
                          for e in enc))
        hid = self.generate_hidden_emb(enc.hidden)
        gph_h, rel_h, att_h, img_h, name_h, char_h = hid

        md = self._matmul_dtype()
        # neg_cross_kg reaches the joint loss as in the reference (SNAG.py:51)
        # — and is inert there too (see icl_loss docstring).
        bundle = self._fused_bundle(enc, links, valid)
        if bundle is not None:
            gmi, ecia = bundle
        else:
            from snag_tpu.losses.contrastive import icl_loss_stacked
            gmi = icl_loss_stacked((enc.joint, enc.joint_fz), links,
                                   tau=cfg.tau, ab_weight=cfg.ab_weight,
                                   valid=valid, matmul_dtype=md)
            ecia = self.inner_view_loss(enc.gph, enc.rel, enc.att, enc.img,
                                        enc.name, enc.char, links, valid,
                                        weight_norm=enc.weight_norm)
        iir = self.inner_view_loss(gph_h, rel_h, att_h, img_h, name_h, char_h,
                                   links, valid)

        loss_list = [gmi, ecia, iir]
        if cfg.awloss:
            loss_all = self.multi_loss_layer_2(loss_list)
        else:
            loss_all = sum(loss_list)

        aux = {"joint_Intra_modal": gmi, "Intra_modal": ecia, "IIR_loss": iir,
               "weight_norm": jax.lax.stop_gradient(enc.weight_norm.mean(axis=0))}
        return loss_all, aux

    def joint_emb(self, feats: FeaturePack, graph: Graph):
        """Eval/IL embedding: frozen-weight joint path (SNAG.py:178-179)."""
        enc = self.multimodal_encoder(feats, graph, None, deterministic=True)
        return enc.joint_fz, enc.weight_norm
