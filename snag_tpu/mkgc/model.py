"""MKGC model: multi-modal TransE-style link prediction with SNAG fusion.

Rebuilt to the readme contract (SNAG_MKGC/readme.md; architecture details
from the paper arXiv:2403.06832 and the shared MMEA fusion code):

* entity/relation embeddings (EMB_DIM=128) + visual/textual feature
  projections (optionally average-pooled to a uniform width, ``use_pool``);
* ``num_proj``: 1 = one shared modality-projection stack; 2 = separate
  stacks for the head-role and tail-role entity representations;
* ``joint_way`` fusion variants over the 3 modality tokens
  [structure, visual, textual]:
    - Mformer_hd_mean   mean of the fusion transformer's output tokens
    - Mformer_hd_graph  the structure token's output
    - Mformer_weight    attention-derived weights x normalized input embs
    - atten_weight      per-entity learned gate weights (no transformer)
    - learnable_weight  global softmax weights (MCLEA-style)
* margin-based ranking against NEG_NUM sampled corruptions, fused into one
  batched matmul/distance computation per step (the BASELINE.json
  "negative sampling + margin ranking in one batched kernel" north star).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.mkgc.config import MKGCConfig
from snag_tpu.ops import inits, noise as noise_ops
from snag_tpu.ops.fusion import BertLayer, l2norm, _tdense


# negative-joint formulation: "auto" picks all-entity fusion + gather when
# the batch touches more joint slots than the entity table (see __call__);
# "on"/"off" force the branch.  Module-level so A/B scripts can flip it
# per-jit without config plumbing.
ALL_ENT_FUSION = "auto"


def avg_pool_features(x: np.ndarray, out_dim: int) -> np.ndarray:
    """Host-side 1D average pooling to a uniform width (readme.md:36
    ``use_pool``)."""
    d = x.shape[1]
    if d <= out_dim:
        return x.astype(np.float32)
    win = -(-d // out_dim)
    pad = win * out_dim - d
    xp = np.pad(x, ((0, 0), (0, pad)))
    return xp.reshape(x.shape[0], out_dim, win).mean(axis=2).astype(np.float32)


class MKGCFeatures(NamedTuple):
    visual: jnp.ndarray    # (E, dv)
    textual: jnp.ndarray   # (E, dt)


class MKGCModel(nn.Module):
    cfg: MKGCConfig
    ent_num: int
    rel_num: int
    vis_dim: int
    txt_dim: int

    def setup(self):
        cfg = self.cfg
        d = cfg.emb_dim
        self.ent_emb = self.param("ent_emb", inits.xavier_normal(),
                                  (self.ent_num, d))
        self.rel_emb = self.param("rel_emb", inits.xavier_normal(),
                                  (self.rel_num, d))
        self.vis_proj = _tdense(d, self.vis_dim, "vis_proj")
        self.txt_proj = _tdense(d, self.txt_dim, "txt_proj")
        if cfg.num_proj == 2:
            self.vis_proj2 = _tdense(d, self.vis_dim, "vis_proj2")
            self.txt_proj2 = _tdense(d, self.txt_dim, "txt_proj2")

        if cfg.joint_way.startswith("Mformer"):
            # fold_qkv=False: at d=128 the folded (d, 3d) matmul costs 25%
            # train throughput vs three fused (d, d) matmuls (298K vs 393K
            # triples/s, scripts/ab_mkgc.py 2026-08-19) — unlike MMEA's
            # d=300 stack where folding is runtime-neutral
            self.fusion_layers = [
                BertLayer(hidden_size=d, num_heads=cfg.num_attention_heads,
                          intermediate_size=cfg.intermediate_size,
                          use_intermediate=bool(cfg.use_intermediate),
                          fold_qkv=False,
                          name=f"fusion_{i}")
                for i in range(cfg.num_hidden_layers)]
        elif cfg.joint_way == "atten_weight":
            self.gate = _tdense(1, d, "gate")
        elif cfg.joint_way == "learnable_weight":
            self.modal_weight = self.param("modal_weight",
                                           nn.initializers.ones, (3,))

    def _modal_tokens(self, idx, feats: MKGCFeatures, role: int,
                      deterministic: bool):
        """(B, 3, d) modality tokens for entities ``idx``; role selects the
        projection stack when num_proj == 2 (0 = head, 1 = tail)."""
        vis_p, txt_p = self.vis_proj, self.txt_proj
        if self.cfg.num_proj == 2 and role == 1:
            vis_p, txt_p = self.vis_proj2, self.txt_proj2
        gph = self.ent_emb[idx]
        vis = vis_p(feats.visual[idx])
        txt = txt_p(feats.textual[idx])
        return jnp.stack([gph, vis, txt], axis=1)

    def _modal_tokens_mixed(self, idx, head_role, feats: MKGCFeatures,
                            deterministic: bool):
        """(B, 3, d) tokens with the projection stack selected per element:
        head_role[b] True -> head-role (0) stack, else tail-role (1).

        Used for corrupted-entity joints: one fusion pass over the K sampled
        corruptions instead of recomputing positive-head and positive-tail
        joints for every (b, k) slot (VERDICT r1 weak item 4)."""
        gph = self.ent_emb[idx]
        v, t = feats.visual[idx], feats.textual[idx]
        if self.cfg.num_proj == 2:
            sel = head_role[:, None]
            vis = jnp.where(sel, self.vis_proj(v), self.vis_proj2(v))
            txt = jnp.where(sel, self.txt_proj(t), self.txt_proj2(t))
        else:
            vis, txt = self.vis_proj(v), self.txt_proj(t)
        return jnp.stack([gph, vis, txt], axis=1)

    def joint(self, idx, feats: MKGCFeatures, role: int = 0,
              deterministic: bool = True) -> jnp.ndarray:
        """Fused (B, d) entity representation per ``joint_way``."""
        tokens = self._modal_tokens(idx, feats, role, deterministic)
        return self._fuse(tokens, deterministic)

    def joint_mixed(self, idx, head_role, feats: MKGCFeatures,
                    deterministic: bool = True) -> jnp.ndarray:
        tokens = self._modal_tokens_mixed(idx, head_role, feats, deterministic)
        return self._fuse(tokens, deterministic)

    def _fuse(self, tokens, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg

        if cfg.joint_way.startswith("Mformer"):
            hidden = tokens
            probs = None
            for layer in self.fusion_layers:
                hidden, probs = layer(hidden, deterministic=deterministic)
            if cfg.joint_way == "Mformer_hd_mean":
                out = hidden.mean(axis=1)
            elif cfg.joint_way == "Mformer_hd_graph":
                out = hidden[:, 0, :]
            else:
                # Mformer_weight: attention-derived weights over input embs
                attention_pro = probs.sum(axis=1).sum(axis=-2) / np.sqrt(
                    3 * cfg.num_attention_heads)
                w = jax.nn.softmax(attention_pro, axis=-1)      # (B, 3)
                out = jnp.einsum("bm,bmd->bd", w, l2norm(tokens, axis=-1))
        elif cfg.joint_way == "atten_weight":
            w = jax.nn.softmax(self.gate(tokens).squeeze(-1), axis=-1)
            out = jnp.einsum("bm,bmd->bd", w, l2norm(tokens, axis=-1))
        else:  # learnable_weight
            w = jax.nn.softmax(self.modal_weight, axis=0)
            out = jnp.einsum("m,bmd->bd", w, l2norm(tokens, axis=-1))

        # unit-norm joint representation: the TransE-style margin objective
        # degenerates without an entity-norm constraint (unconstrained "hub"
        # entities collapse toward every query) — standard TransE practice.
        return l2norm(out)

    def __call__(self, pos: jnp.ndarray, rand_ent: jnp.ndarray,
                 corrupt_head: jnp.ndarray, feats: MKGCFeatures,
                 deterministic: bool = False):
        """Margin ranking loss.

        pos: (B, 3) triples; rand_ent: (B, K) sampled corruption entities;
        corrupt_head: (B, K) bool — True means rand_ent replaces the head.
        Joints are computed only for the positives (B head + B tail) and the
        K corruptions (B*K role-mixed), not for 2*B*K head+tail slots — the
        uncorrupted side reuses the positive joint.
        """
        cfg = self.cfg
        b, k = rand_ent.shape
        r = self.rel_emb[pos[:, 1]]

        use_all = (b * (k + 2) > 2 * self.ent_num
                   if ALL_ENT_FUSION == "auto" else ALL_ENT_FUSION == "on")
        if use_all:
            # the batch touches more joint slots than the whole entity set:
            # fuse EVERY entity once per role and gather (1.9x fewer fusion
            # passes at DB15K geometry, where B*K ~ 3.5x the entity count)
            idx = jnp.arange(self.ent_num)
            all_h = self.joint(idx, feats, role=0, deterministic=deterministic)
            all_t = self.joint(idx, feats, role=1, deterministic=deterministic)
            h = all_h[pos[:, 0]]
            t = all_t[pos[:, 2]]
            cor = jnp.where(corrupt_head[:, :, None],
                            all_h[rand_ent], all_t[rand_ent])
        else:
            h = self.joint(pos[:, 0], feats, role=0,
                           deterministic=deterministic)
            t = self.joint(pos[:, 2], feats, role=1,
                           deterministic=deterministic)
            cor = self.joint_mixed(rand_ent.reshape(-1),
                                   corrupt_head.reshape(-1), feats,
                                   deterministic=deterministic
                                   ).reshape(b, k, -1)

        def dist(x, rel, y):
            return jnp.linalg.norm(x + rel - y, axis=-1)

        d_pos = dist(h, r, t)                                   # (B,)
        d_neg = jnp.where(
            corrupt_head,
            dist(cor, r[:, None, :], t[:, None, :]),            # corrupted head
            dist(h[:, None, :], r[:, None, :], cor))            # corrupted tail
        loss = jnp.maximum(cfg.margin + d_pos[:, None] - d_neg, 0.0).mean()
        return loss, {"d_pos": d_pos.mean(), "d_neg": d_neg.mean()}

    def all_joint(self, feats: MKGCFeatures, role: int = 0) -> jnp.ndarray:
        idx = jnp.arange(self.ent_num)
        return self.joint(idx, feats, role=role, deterministic=True)
