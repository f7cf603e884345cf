"""Training-history accumulator (reference: SNAG_MMEA/src/utils.py:110-200).

Tracks loss history, best-metric (MRR) history, and drives the
early-stopping counter used by the Runner.
"""

from __future__ import annotations

from typing import List


class LossLog:
    def __init__(self):
        self.loss: List[float] = [999999.0]
        self.acc: List[float] = [0.0]

    def acc_init(self):
        self.loss = []

    def update(self, value: float):
        self.loss.append(value)

    def update_acc(self, value: float):
        self.acc.append(value)

    def get_acc(self) -> float:
        return self.acc[-1]

    def get_min_loss(self) -> float:
        return min(self.loss)

    def get_loss(self) -> float:
        if len(self.loss) == 0:
            return 500.0
        return float(sum(self.loss) / len(self.loss))
