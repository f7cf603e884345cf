"""Shared multi-modal encoder.

The five reference models share ~80% of their encoder: entity table + graph
encoder + per-modality linear projections + fusion.  This module is that
shared trunk (reference: SNAG_MMEA/model/SNAG_tools.py:53-156, duplicated in
MEAformer_tools.py / MCLEA_tools.py); the model classes pick a fusion and a
loss bundle on top.

Feature tables flow in as a ``FeaturePack`` pytree prepared once by the data
layer (image table row-normalized like the reference model __init__,
SNAG.py:23).  Noise is applied by the caller (train step) for the feature
tables and inside here for the entity embedding (half rates,
SNAG_tools.py:127-128).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.config import Config
from snag_tpu.data.graph import Graph
from snag_tpu.ops import noise as noise_ops
from snag_tpu.ops.fusion import MformerFusion, l2norm, _tdense
from snag_tpu.ops.gnn import GAT, GCN
from snag_tpu.ops import inits


class FeaturePack(NamedTuple):
    """Per-entity modality feature tables (None = modality absent)."""
    img: Optional[jnp.ndarray]
    rel: Optional[jnp.ndarray]
    att: Optional[jnp.ndarray]
    name: Optional[jnp.ndarray]
    char: Optional[jnp.ndarray]


class FeatureStats(NamedTuple):
    """Column statistics for noise-masking (img over image-bearing rows)."""
    img: noise_ops.TableStats
    rel: noise_ops.TableStats
    att: noise_ops.TableStats


class EncoderOutput(NamedTuple):
    gph: Optional[jnp.ndarray]
    img: Optional[jnp.ndarray]
    rel: Optional[jnp.ndarray]
    att: Optional[jnp.ndarray]
    name: Optional[jnp.ndarray]
    char: Optional[jnp.ndarray]
    joint: jnp.ndarray
    joint_fz: Optional[jnp.ndarray]
    hidden: Optional[jnp.ndarray]
    weight_norm: Optional[jnp.ndarray]
    # (6,) softmax(weight_raw) — lets SNAG's fused loss bundle rebuild the
    # fz joint similarity from per-modality blocks (losses/contrastive)
    weight_fz: Optional[jnp.ndarray] = None

    def modal_list(self):
        """[img, att, rel, gph, name, char] — the fusion input order
        (SNAG_tools.py:154)."""
        return [self.img, self.att, self.rel, self.gph, self.name, self.char]


class MultiModalEncoder(nn.Module):
    cfg: Config
    ent_num: int
    img_feature_dim: int
    attr_input_dim: int
    char_feature_dim: int
    fusion_kind: str = "mformer"   # mformer | mformer_single | mean | none

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        cfg = self.cfg
        input_dim = cfg.n_units()[0]
        self.entity_emb = self.param(
            "entity_emb", inits.normal_std(1.0 / np.sqrt(self.ent_num)),
            (self.ent_num, input_dim))

        self.rel_fc = _tdense(cfg.attr_dim, 1000, "rel_fc", self.dtype)
        self.att_fc = _tdense(cfg.attr_dim, self.attr_input_dim, "att_fc", self.dtype)
        self.img_fc = _tdense(cfg.img_dim, self.img_feature_dim, "img_fc", self.dtype)
        self.name_fc = _tdense(cfg.char_dim, 300, "name_fc", self.dtype)
        self.char_fc = _tdense(cfg.char_dim, self.char_feature_dim, "char_fc", self.dtype)

        # --remat: rematerialize GNN activations in the backward pass (trades
        # FLOPs for memory; for the 100K-entity datasets)
        gcn_cls = nn.remat(GCN) if cfg.remat else GCN
        gat_cls = nn.remat(GAT) if cfg.remat else GAT
        if cfg.structure_encoder == "gcn":
            u = cfg.n_units()
            self.cross_graph_model = gcn_cls(u[0], u[1], u[2],
                                             dropout=cfg.dropout,
                                             dtype=self.dtype)
        else:
            self.cross_graph_model = gat_cls(
                n_units=cfg.n_units(), n_heads=cfg.n_heads(),
                dropout=cfg.dropout, attn_dropout=cfg.attn_dropout,
                instance_normalization=cfg.instance_normalization, diag=True,
                dtype=self.dtype)

        if self.fusion_kind in ("mformer", "mformer_single"):
            self.fusion = MformerFusion(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_attention_heads,
                num_layers=cfg.num_hidden_layers,
                intermediate_size=cfg.intermediate_size,
                use_intermediate=bool(cfg.use_intermediate),
                with_fz=(self.fusion_kind == "mformer"),
                dtype=self.dtype)
        elif self.fusion_kind == "mean":
            from snag_tpu.ops.fusion import MeanFusion
            self.fusion = MeanFusion(modal_num=cfg.inner_view_num,
                                     with_weight=cfg.with_weight)
        else:
            self.fusion = None

        if cfg.use_project_head:
            from snag_tpu.models.heads import ProjectionHead
            u2 = cfg.n_units()[2]
            self.img_pro = ProjectionHead(cfg.img_dim, cfg.img_dim, cfg.dropout)
            self.att_pro = ProjectionHead(cfg.attr_dim, cfg.attr_dim, cfg.dropout)
            self.rel_pro = ProjectionHead(cfg.attr_dim, cfg.attr_dim, cfg.dropout)
            self.gph_pro = ProjectionHead(u2, u2, cfg.dropout)

    def modal_embeddings(self, feats: FeaturePack, graph: Graph,
                         entity_noise_key: Optional[jax.Array] = None,
                         deterministic: bool = True,
                         rows: Optional[jnp.ndarray] = None):
        """Per-modality embeddings before fusion (SNAG_tools.py:108-152).

        ``rows``: optional entity-id subset.  Only the graph encoder needs
        the full entity set (cross-entity aggregation); the projections and
        fusion are per-entity, so the train step passes its batch rows here
        and everything downstream runs at (2B, ...) instead of (N, ...) —
        a ~4x cut at DBP15K geometry.  The reference encodes all entities
        every step (SNAG.py:166-181) only because nothing sliced earlier;
        gradients are identical (non-batch rows carry zero cotangents)."""
        cfg = self.cfg
        if cfg.w_gcn:
            ent = self.entity_emb
            if entity_noise_key is not None:
                ent = noise_ops.entity_noise(entity_noise_key, ent,
                                             cfg.noise_ratio, cfg.mask_ratio)
            gph = self.cross_graph_model(ent, graph, deterministic=deterministic)
            if rows is not None:
                gph = gph[rows]
        else:
            gph = None

        def sel(t):
            return t if rows is None else t[rows]

        img = self.img_fc(sel(feats.img)) if cfg.w_img else None
        rel = self.rel_fc(sel(feats.rel)) if cfg.w_rel else None
        att = self.att_fc(sel(feats.att)) if cfg.w_attr else None
        name = self.name_fc(sel(feats.name)) if (cfg.w_name and feats.name is not None) else None
        char = self.char_fc(sel(feats.char)) if (cfg.w_char and feats.char is not None) else None

        if cfg.use_project_head:
            gph = self.gph_pro(gph, deterministic=deterministic) if gph is not None else None
            img = self.img_pro(img, deterministic=deterministic) if img is not None else None
            rel = self.rel_pro(rel, deterministic=deterministic) if rel is not None else None
            att = self.att_pro(att, deterministic=deterministic) if att is not None else None
        return gph, img, rel, att, name, char

    def __call__(self, feats: FeaturePack, graph: Graph,
                 entity_noise_key: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 rows: Optional[jnp.ndarray] = None) -> EncoderOutput:
        gph, img, rel, att, name, char = self.modal_embeddings(
            feats, graph, entity_noise_key, deterministic, rows=rows)

        # materialize each modal embedding exactly once.  Without this
        # barrier XLA fuses the producer chains (the CSR gather GAT above
        # all) into EVERY downstream consumer — QKV projections, l2norm,
        # residuals, both joint paths — recomputing the gather ~12x
        # (profiled 2026-08-16: 43 GB accessed/step, encoder fwd 107 ms
        # vs ~5 ms with the barrier).
        outs = jax.lax.optimization_barrier(
            [e for e in (gph, img, rel, att, name, char) if e is not None])
        it = iter(outs)
        gph, img, rel, att, name, char = (
            next(it) if e is not None else None
            for e in (gph, img, rel, att, name, char))

        fusion_inputs = [img, att, rel, gph, name, char]
        weight_fz = None
        if self.fusion_kind in ("mformer", "mformer_single"):
            joint, joint_fz, hidden, weight_norm, weight_fz = self.fusion(
                fusion_inputs, deterministic=deterministic)
        elif self.fusion_kind == "mean":
            joint = self.fusion(fusion_inputs)
            joint_fz, hidden, weight_norm = None, None, None
        else:
            joint, joint_fz, hidden, weight_norm = None, None, None, None

        return EncoderOutput(gph=gph, img=img, rel=rel, att=att, name=name,
                             char=char, joint=joint, joint_fz=joint_fz,
                             hidden=hidden, weight_norm=weight_norm,
                             weight_fz=weight_fz)


def batch_rows(links: jnp.ndarray):
    """(rows, local_links) for batch-subset encoding: rows stacks the left
    then right link entities; local_links index into that stack."""
    b = links.shape[0]
    rows = jnp.concatenate([links[:, 0], links[:, 1]])
    local = jnp.stack([jnp.arange(b, dtype=links.dtype),
                       b + jnp.arange(b, dtype=links.dtype)], axis=1)
    return rows, local


def prepare_features(cfg: Config, data) -> FeaturePack:
    """Pack raw numpy tables; image rows normalized (SNAG.py:23)."""
    img = np.asarray(data.img_features, dtype=np.float32)
    n = np.linalg.norm(img, axis=1, keepdims=True)
    img = img / np.maximum(n, 1e-12)
    return FeaturePack(
        img=jnp.asarray(img),
        rel=jnp.asarray(data.rel_features),
        att=jnp.asarray(data.att_features),
        name=jnp.asarray(data.name_features) if (data.name_features is not None and cfg.w_name) else None,
        char=jnp.asarray(data.char_features) if (data.char_features is not None and cfg.w_char) else None,
    )


def prepare_stats(feats: FeaturePack, ent_w_img) -> FeatureStats:
    """Noise statistics (SNAG.py:77-84): image stats over image-bearing rows
    of the *normalized* table; rel/att over all rows."""
    w_img = jnp.asarray(np.asarray(ent_w_img, dtype=np.int32))
    return FeatureStats(
        img=noise_ops.table_stats(feats.img, valid_rows=w_img),
        rel=noise_ops.table_stats(feats.rel),
        att=noise_ops.table_stats(feats.att),
    )


def apply_feature_noise(key: jax.Array, feats: FeaturePack,
                        stats: FeatureStats, noise_ratio: float,
                        mask_ratio: float) -> FeaturePack:
    """Per-epoch noisy views of img/rel/att (update_noise, SNAG.py:86-91).
    name/char features are never noised in the reference."""
    k_img, k_rel, k_att = jax.random.split(key, 3)
    return feats._replace(
        img=noise_ops.noise_mask_table(k_img, feats.img, stats.img, noise_ratio, mask_ratio),
        rel=noise_ops.noise_mask_table(k_rel, feats.rel, stats.rel, noise_ratio, mask_ratio),
        att=noise_ops.noise_mask_table(k_att, feats.att, stats.att, noise_ratio, mask_ratio),
    )
