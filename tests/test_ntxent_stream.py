"""Streaming (flash-style Pallas) NT-Xent vs the dense block formulation.

Runs the kernels in interpret mode on the CPU test mesh; the same code
compiles on TPU (scripts/check_ntxent_tpu.py A/Bs it on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import snag_tpu.ops.pallas.ntxent_kernel as nk
from snag_tpu.losses.contrastive import (_icl_xent_batched, icl_loss_multi,
                                         icl_loss_stacked)


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(nk, "FORCE_INTERPRET", True)


def _mk(m, n, b, d, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(m, n, d)).astype(np.float32)
    emb = emb / np.linalg.norm(emb, axis=2, keepdims=True)
    links = rng.choice(n, size=(b, 2), replace=False).astype(np.int32)
    return jnp.asarray(emb), jnp.asarray(links)


@pytest.mark.parametrize("b,d", [(9, 8), (130, 48), (257, 300)])
def test_streaming_matches_dense(force_interpret, b, d):
    m, n = 3, max(2 * b + 4, 64)
    emb, links = _mk(m, n, b, d)
    zis = emb[:, links[:, 0], :]
    zjs = emb[:, links[:, 1], :]
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.uniform(0.2, 1, size=(m, b)).astype(np.float32))
    valid = jnp.asarray(np.arange(b) < b - 3)

    def run(zis, zjs, w):
        return _icl_xent_batched(zis, zjs, w, valid, 0.1, 0.4).sum()

    v_s, g_s = jax.value_and_grad(run, argnums=(0, 1, 2))(zis, zjs, w)
    nk.FORCE_INTERPRET = False          # dense fallback on CPU
    v_d, g_d = jax.value_and_grad(run, argnums=(0, 1, 2))(zis, zjs, w)
    nk.FORCE_INTERPRET = True

    np.testing.assert_allclose(float(v_s), float(v_d), rtol=2e-5)
    for a, bb in zip(g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-5, rtol=1e-3)


def test_streaming_no_mask_no_weight(force_interpret):
    emb, links = _mk(2, 80, 33, 17, seed=4)
    zis, zjs = emb[:, links[:, 0], :], emb[:, links[:, 1], :]

    def run(zis, zjs):
        return _icl_xent_batched(zis, zjs, None, None, 0.08, 0.5).sum()

    v_s, g_s = jax.value_and_grad(run, argnums=(0, 1))(zis, zjs)
    nk.FORCE_INTERPRET = False
    v_d, g_d = jax.value_and_grad(run, argnums=(0, 1))(zis, zjs)
    nk.FORCE_INTERPRET = True
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=2e-5)
    for a, bb in zip(g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-5, rtol=1e-3)


def test_streaming_grads_match_autodiff(force_interpret):
    """End-to-end: icl_loss_multi through the streaming kernels must agree
    with plain autodiff of the materialized-concat reference formulation
    (mirrors test_losses.test_streaming_icl_grads_match_autodiff)."""
    LARGE = 1e9
    rng = np.random.default_rng(0)
    M, B, N, d = 2, 10, 40, 8
    emb = jnp.asarray(rng.normal(size=(M, N, d)).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb, axis=2, keepdims=True)
    links = jnp.asarray(
        rng.choice(N, size=(B, 2), replace=False).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.2, 1, size=(M, B)).astype(np.float32))
    valid = jnp.asarray(np.array([True] * 8 + [False] * 2))

    def ref(emb, w):
        zis, zjs = emb[:, links[:, 0], :], emb[:, links[:, 1], :]
        eye = jnp.eye(B)
        z = jnp.concatenate([zis, zjs], axis=1)
        big = jnp.einsum("mbd,mcd->mbc", z, z) / 0.1
        ab = big[:, :B, B:]
        aa = big[:, :B, :B] - eye * LARGE
        bb = big[:, B:, B:] - eye * LARGE
        cm = jnp.where(valid[None, None, :], 0.0, -LARGE)
        rm = jnp.where(valid[None, :, None], 0.0, -LARGE)
        ab, aa, bb = ab + cm + rm, aa + cm + rm, bb + cm + rm
        la = jnp.concatenate([ab, aa], axis=2)
        lb = jnp.concatenate([jnp.swapaxes(ab, 1, 2), bb], axis=2)

        def xent(l):
            lp = jax.nn.log_softmax(l, axis=2)
            per = -lp[:, jnp.arange(B), jnp.arange(B)] * w
            per = jnp.where(valid[None, :], per, 0.0)
            return per.sum(axis=1) / valid.sum()

        return (0.4 * xent(la) + 0.6 * xent(lb)).sum()

    def mine(emb, w):
        return icl_loss_multi(emb, links, tau=0.1, ab_weight=0.4,
                              w_min=w, valid=valid).sum()

    v1, g1 = jax.value_and_grad(ref, argnums=(0, 1))(emb, w)
    v2, g2 = jax.value_and_grad(mine, argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_streaming_stacked_bf16(force_interpret):
    """The production GMI path: bf16 inputs through icl_loss_stacked."""
    emb, links = _mk(1, 100, 40, 32, seed=7)
    e0, e1 = emb[0], jnp.roll(emb[0], 3, axis=0)
    valid = jnp.asarray(np.arange(40) < 37)

    def run(e0, e1):
        return icl_loss_stacked((e0, e1), links, tau=0.1, ab_weight=0.5,
                                valid=valid, matmul_dtype=jnp.bfloat16)

    v_s, g_s = jax.value_and_grad(run, argnums=(0, 1))(e0, e1)
    nk.FORCE_INTERPRET = False
    v_d, g_d = jax.value_and_grad(run, argnums=(0, 1))(e0, e1)
    nk.FORCE_INTERPRET = True
    np.testing.assert_allclose(float(v_s), float(v_d), rtol=5e-3)
    for a, b in zip(g_s, g_d):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   atol=3e-3, rtol=5e-2)
