"""Metric accumulator ABCs (reference: SNAG_MMEA/torchlight/metric.py:6-114).

Unused by the reference Runner (it computes metrics inline) but part of the
public torchlight API surface; kept for parity.  Pure-python/numpy.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class Metric:
    """Batch/epoch accumulator base."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._count = 0
        self._totals: Dict[str, float] = {}

    def update(self, values: Dict[str, float], n: int = 1):
        self._count += n
        for k, v in values.items():
            self._totals[k] = self._totals.get(k, 0.0) + float(v) * n

    def compute(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        return {k: v / self._count for k, v in self._totals.items()}


class TopKMetric(Metric):
    """Top-k + MR/MRR accumulator over rank arrays."""

    def __init__(self, top_k: Sequence[int] = (1, 10, 50)):
        self.top_k = tuple(top_k)
        super().__init__()

    def update_ranks(self, ranks: np.ndarray):
        ranks = np.asarray(ranks)
        vals = {f"hits{k}": float((ranks < k).mean()) for k in self.top_k}
        vals["mr"] = float((ranks + 1).mean())
        vals["mrr"] = float((1.0 / (ranks + 1)).mean())
        self.update(vals, n=len(ranks))
