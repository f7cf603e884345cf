"""Seeding (reference: SNAG_MMEA/torchlight/utils.py:31-40).

JAX RNG is functional; global seeding only affects python/numpy (used by the
data pipeline's shuffles and splits).  Model/noise randomness flows through
explicit `jax.random` keys derived from the same seed.
"""

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
