"""Parameter initializers matching the reference's PyTorch defaults.

Metric-level parity (BASELINE.json: within 0.5 pt) is sensitive to init
*scale*, so Dense layers use torch's ``nn.Linear`` default
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
kernel and bias) instead of flax's lecun_normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    # flax Dense kernel shape: (fan_in, fan_out)
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_fan(fan_in: int):
    """torch kernel init at an EXPLICIT fan-in — for layers whose reference
    counterpart sees a wider (zero-padded) input table than ours, e.g.
    rel_fc's fixed 1000-column bag (src/data.py:521-538)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def uniform_stdv(stdv: float):
    """U(-stdv, stdv) — GraphConvolution's reset_parameters (layers.py:118-122)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


def xavier_uniform():
    return jax.nn.initializers.glorot_uniform()


def xavier_normal():
    return jax.nn.initializers.glorot_normal()


def xavier_normal_fan(fan_in: int):
    """xavier_normal at an EXPLICIT fan-in (fan-out from the shape) — for
    kernels whose reference counterpart sees a wider zero-padded input,
    e.g. EVA's rel_fc at the fixed 1000-column bag (EVA.py:43,55)."""
    def init(key, shape, dtype=jnp.float32):
        std = np.sqrt(2.0 / (fan_in + shape[1]))
        return std * jax.random.normal(key, shape, dtype)
    return init


def normal_std(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init
