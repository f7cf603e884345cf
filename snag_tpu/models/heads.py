"""Small shared heads (reference: SNAG_MMEA/model/layers.py:135-148)."""

from __future__ import annotations

import flax.linen as nn

from snag_tpu.ops.fusion import _tdense


class ProjectionHead(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_dim = x.shape[-1]
        x = nn.Dense(self.hidden_dim, use_bias=False, name="l1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, use_bias=False, name="l2")(x)
        return x
