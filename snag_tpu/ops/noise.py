"""Gaussian noise-masking — the paper's core robustness mechanism.

Reference semantics (SNAG_MMEA/model/SNAG.py:66-99): once per epoch, each
feature-table row is selected w.p. ``noise_ratio`` and blended with a sample
of N(col_mean, col_std):  x' = (1-mask_ratio) x + mask_ratio (mu + sigma eps).
Entity embeddings get half rates (noise_ratio*0.5, mask_ratio*0.5) applied
inside the encoder forward (SNAG_tools.py:127-128).

TPU-native design: no in-place boolean row writes and no stored noisy copies.
The noise is a pure function of an epoch-folded PRNG key, recomputed inside
the jitted step (same key per epoch -> identical noise across the epoch's
steps, matching the reference's update_noise cadence; fold per-step for the
MKGC ``noise_level=step`` mode).  XLA fuses the blend into the consumer's
feature-table read, so the cost is one extra elementwise pass, not an extra
(N, d) HBM buffer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class TableStats(NamedTuple):
    mean: jnp.ndarray  # (d,)
    std: jnp.ndarray   # (d,)


def table_stats(x: jnp.ndarray, valid_rows: Optional[jnp.ndarray] = None,
                ddof: int = 1) -> TableStats:
    """Column mean/std.  ``valid_rows`` restricts the statistics (the image
    table only counts entities that really have an image, SNAG.py:77-80).
    torch.std defaults to the unbiased estimator, hence ddof=1."""
    if valid_rows is not None:
        x = x[valid_rows]
    mean = x.mean(axis=0)
    n = x.shape[0]
    var = jnp.sum((x - mean) ** 2, axis=0) / jnp.maximum(n - ddof, 1)
    return TableStats(mean=mean, std=jnp.sqrt(var))


def noise_mask_table(key: jax.Array, x: jnp.ndarray, stats: TableStats,
                     noise_ratio: float, mask_ratio: float) -> jnp.ndarray:
    """Row-masked Gaussian blend (add_noise_to_embeddings, SNAG.py:66-75)."""
    k_rows, k_noise = jax.random.split(key)
    rows = jax.random.uniform(k_rows, (x.shape[0],)) < noise_ratio
    noise = stats.mean + stats.std * jax.random.normal(k_noise, x.shape, x.dtype)
    blended = (1.0 - mask_ratio) * x + mask_ratio * noise
    return jnp.where(rows[:, None], blended, x)


def entity_noise(key: jax.Array, emb: jnp.ndarray, noise_ratio: float,
                 mask_ratio: float) -> jnp.ndarray:
    """Entity-embedding noise at half rates (SNAG.py:94-98 +
    SNAG_tools.py:127-128).  Statistics are taken over the current embedding
    table (stop-gradient: the reference reads .weight.data)."""
    emb_sg = jax.lax.stop_gradient(emb)
    stats = table_stats(emb_sg)
    k_rows, k_noise = jax.random.split(key)
    rows = jax.random.uniform(k_rows, (emb.shape[0],)) < noise_ratio * 0.5
    noise = stats.mean + stats.std * jax.random.normal(k_noise, emb.shape, emb.dtype)
    half = mask_ratio * 0.5
    blended = (1.0 - half) * emb + half * noise
    return jnp.where(rows[:, None], blended, emb)


def epoch_key(base_key: jax.Array, epoch: jnp.ndarray) -> jax.Array:
    return jax.random.fold_in(base_key, epoch)
