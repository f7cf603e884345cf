"""Learnable multi-task loss weighting layers.

* ``KendallLossLayer`` — homoscedastic-uncertainty weighting
  sum_i exp(-s_i) L_i + s_i (reference: SNAG_MMEA/model/SNAG_loss.py:12-29,
  duplicated in MCLEA_loss.py / MEAformer_loss.py).  The reference always
  passes a length-6 list with literal 0 for missing modalities, so every
  log-var contributes its +s_i term regardless; reproduced here.
* ``AutomaticWeightedLoss`` — sum_i 0.5/p_i^2 L_i + log(1+p_i^2)
  (model/Tool_model.py:14-39).
"""

from __future__ import annotations

from typing import List, Union

import flax.linen as nn
import jax.numpy as jnp

Scalar = Union[jnp.ndarray, float, int]


class KendallLossLayer(nn.Module):
    loss_num: int

    @nn.compact
    def __call__(self, loss_list: List[Scalar]) -> jnp.ndarray:
        assert len(loss_list) <= self.loss_num
        log_vars = self.param("log_vars", nn.initializers.zeros, (self.loss_num,))
        precision = jnp.exp(-log_vars)
        total = jnp.asarray(0.0)
        for i, l in enumerate(loss_list):
            total = total + precision[i] * l + log_vars[i]
        return total


class AutomaticWeightedLoss(nn.Module):
    num: int = 2

    @nn.compact
    def __call__(self, loss_list: List[Scalar]) -> jnp.ndarray:
        params = self.param("params", nn.initializers.ones, (self.num,))
        total = jnp.asarray(0.0)
        for i, l in enumerate(loss_list):
            total = total + 0.5 / (params[i] ** 2) * l + jnp.log(1 + params[i] ** 2)
        return total
