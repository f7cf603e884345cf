"""Noise-masking semantics (reference: SNAG.py:66-99)."""

import jax
import jax.numpy as jnp
import numpy as np

from snag_tpu.ops import noise as noise_ops


def test_table_stats_unbiased_std():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(500, 4)).astype(np.float32)
    st = noise_ops.table_stats(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(st.mean), x.mean(0), atol=1e-4)
    # torch.std default is ddof=1
    np.testing.assert_allclose(np.asarray(st.std), x.std(0, ddof=1), rtol=1e-4)


def test_table_stats_valid_rows():
    x = np.zeros((10, 3), dtype=np.float32)
    x[:5] = 7.0
    st = noise_ops.table_stats(jnp.asarray(x),
                               valid_rows=jnp.arange(5, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(st.mean), 7.0)


def test_noise_mask_blend():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 8)).astype(np.float32)
    st = noise_ops.table_stats(jnp.asarray(x))
    key = jax.random.PRNGKey(0)
    out = np.asarray(noise_ops.noise_mask_table(key, jnp.asarray(x), st,
                                                noise_ratio=0.3, mask_ratio=0.5))
    changed = ~(out == x).all(axis=1)
    frac = changed.mean()
    assert 0.2 < frac < 0.4, frac           # ~noise_ratio rows changed
    # unchanged rows are bit-identical
    np.testing.assert_array_equal(out[~changed], x[~changed])
    # changed rows follow the (1-m)x + m*noise blend: residual has the right
    # scale (m * std of noise ~= 0.5 * 1.0)
    resid = out[changed] - 0.5 * x[changed]
    assert 0.3 < resid.std() < 0.8


def test_noise_deterministic_per_key():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
    st = noise_ops.table_stats(x)
    k = jax.random.PRNGKey(3)
    a = noise_ops.noise_mask_table(k, x, st, 0.2, 0.5)
    b = noise_ops.noise_mask_table(k, x, st, 0.2, 0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = noise_ops.noise_mask_table(jax.random.PRNGKey(4), x, st, 0.2, 0.5)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_entity_noise_half_rates():
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(4000, 6)).astype(np.float32))
    out = np.asarray(noise_ops.entity_noise(jax.random.PRNGKey(0), emb,
                                            noise_ratio=0.4, mask_ratio=0.6))
    changed = ~(out == np.asarray(emb)).all(axis=1)
    assert 0.12 < changed.mean() < 0.28     # ~0.4 * 0.5 rows
