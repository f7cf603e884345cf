"""Loss parity vs naive numpy implementations written from the math."""

import numpy as np
import jax.numpy as jnp

from snag_tpu.losses.contrastive import icl_loss, ial_loss, nca_loss

LARGE = 1e9


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def naive_icl(emb, links, tau, alpha, w=None):
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    zi, zj = emb[links[:, 0]], emb[links[:, 1]]
    b = len(links)
    eye = np.eye(b)
    ab = zi @ zj.T / tau
    aa = zi @ zi.T / tau - eye * LARGE
    bb = zj @ zj.T / tau - eye * LARGE

    def xent(logits):
        logp = np.log(_softmax(logits, axis=1))
        per = -logp[np.arange(b), np.arange(b)]
        if w is not None:
            per = per * w
        return per.mean()

    la = xent(np.concatenate([ab, aa], axis=1))
    lb = xent(np.concatenate([ab.T, bb], axis=1))
    return alpha * la + (1 - alpha) * lb


def test_icl_matches_naive():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(50, 16)).astype(np.float32)
    links = rng.choice(50, size=(12, 2), replace=False).astype(np.int32)
    got = icl_loss(jnp.asarray(emb), jnp.asarray(links), tau=0.1, ab_weight=0.5)
    want = naive_icl(emb, links, 0.1, 0.5)
    np.testing.assert_allclose(float(got), want, rtol=2e-3)


def test_icl_weighted():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(40, 8)).astype(np.float32)
    links = rng.choice(40, size=(10, 2), replace=False).astype(np.int32)
    wn = rng.uniform(0.1, 1.0, size=(40,)).astype(np.float32)
    w_min = np.minimum(wn[links[:, 0]], wn[links[:, 1]])
    got = icl_loss(jnp.asarray(emb), jnp.asarray(links), tau=0.1,
                   ab_weight=0.5, weight_norm=jnp.asarray(wn))
    want = naive_icl(emb, links, 0.1, 0.5, w=w_min)
    np.testing.assert_allclose(float(got), want, rtol=2e-3)


def test_streaming_icl_grads_match_autodiff():
    """The custom-VJP streaming NT-Xent core must agree with plain autodiff
    of the materialized-concat formulation, values AND gradients."""
    import jax
    from snag_tpu.losses.contrastive import icl_loss_multi

    rng = np.random.default_rng(0)
    M, B, N, d = 3, 10, 40, 8
    emb = jnp.asarray(rng.normal(size=(M, N, d)).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb, axis=2, keepdims=True)
    links = jnp.asarray(rng.choice(N, size=(B, 2), replace=False).astype(np.int32))
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
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def naive_icl_inversion(emb, links, tau, alpha):
    """Reference inversion branch (SNAG_loss.py:115-118): [ab|bb] / [ba|aa]."""
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    zi, zj = emb[links[:, 0]], emb[links[:, 1]]
    b = len(links)
    eye = np.eye(b)
    ab = zi @ zj.T / tau
    aa = zi @ zi.T / tau - eye * LARGE
    bb = zj @ zj.T / tau - eye * LARGE

    def xent(logits):
        logp = np.log(_softmax(logits, axis=1))
        return -logp[np.arange(b), np.arange(b)].mean()

    la = xent(np.concatenate([ab, bb], axis=1))
    lb = xent(np.concatenate([ab.T, aa], axis=1))
    return alpha * la + (1 - alpha) * lb


def test_icl_inversion_matches_naive():
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(50, 16)).astype(np.float32)
    links = rng.choice(50, size=(12, 2), replace=False).astype(np.int32)
    got = icl_loss(jnp.asarray(emb), jnp.asarray(links), tau=0.1,
                   ab_weight=0.5, inversion=True)
    want = naive_icl_inversion(emb, links, 0.1, 0.5)
    np.testing.assert_allclose(float(got), want, rtol=2e-3)
    # and it is genuinely a different objective than the default blocks
    plain = icl_loss(jnp.asarray(emb), jnp.asarray(links), tau=0.1,
                     ab_weight=0.5)
    assert abs(float(got) - float(plain)) > 1e-6


def test_icl_neg_cross_kg_inert():
    """Reference parity: the flag is stored and never read
    (MEAformer_loss.py:50) — passing it must not change the loss."""
    rng = np.random.default_rng(6)
    emb = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    links = rng.choice(30, size=(8, 2), replace=False).astype(np.int32)
    a = icl_loss(emb, jnp.asarray(links), tau=0.1, neg_cross_kg=False)
    b = icl_loss(emb, jnp.asarray(links), tau=0.1, neg_cross_kg=True)
    assert float(a) == float(b)


def test_ial_inversion_runs_and_differs():
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    tar = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    links = rng.choice(40, size=(10, 2), replace=False).astype(np.int32)
    a = ial_loss(src, tar, jnp.asarray(links), tau=4.0)
    b = ial_loss(src, tar, jnp.asarray(links), tau=4.0, inversion=True)
    assert np.isfinite(float(a)) and np.isfinite(float(b))
    assert abs(float(a) - float(b)) > 1e-9


def test_icl_padded_batch_equals_unpadded():
    """A capacity-padded batch with validity mask must produce the same loss
    as the raw ragged batch."""
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(60, 12)).astype(np.float32))
    links = rng.choice(60, size=(9, 2), replace=False).astype(np.int32)
    full = icl_loss(emb, jnp.asarray(links), tau=0.2, ab_weight=0.4)

    padded = np.vstack([links, np.zeros((7, 2), np.int32)])
    valid = np.array([True] * 9 + [False] * 7)
    got = icl_loss(emb, jnp.asarray(padded), tau=0.2, ab_weight=0.4,
                   valid=jnp.asarray(valid))
    np.testing.assert_allclose(float(got), float(full), rtol=2e-3)


def naive_ial(src, tar, links, tau, alpha, zoom):
    def norm(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)
    src, tar = norm(src), norm(tar)
    si, sj = src[links[:, 0]], src[links[:, 1]]
    ti, tj = tar[links[:, 0]], tar[links[:, 1]]
    b = len(links)
    eye = np.eye(b)

    def blocks(x, y):
        ab = x @ y.T / tau
        aa = x @ x.T / tau - eye * LARGE
        return np.concatenate([ab, aa], axis=1)

    def kl(p, q):
        logp = np.log(_softmax(p, 1))
        qq = _softmax(q, 1)
        # torch kl_div xlogy semantics: zero where the target is zero
        elem = np.where(qq > 0, qq * (np.log(qq + 1e-30) - logp), 0.0)
        return elem.mean()

    la = kl(blocks(si, sj), blocks(ti, tj))
    lb = kl(blocks(sj, si), blocks(tj, ti))
    return zoom * (alpha * la + (1 - alpha) * lb)


def test_ial_matches_naive():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(30, 8)).astype(np.float32)
    tar = rng.normal(size=(30, 8)).astype(np.float32)
    links = rng.choice(30, size=(8, 2), replace=False).astype(np.int32)
    got = ial_loss(jnp.asarray(src), jnp.asarray(tar), jnp.asarray(links),
                   tau=4.0, ab_weight=0.5, zoom=0.1)
    want = naive_ial(src, tar, links, 4.0, 0.5, 0.1)
    np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-6)


def naive_nca(emb, links, alpha, beta):
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    im, s = emb[links[:, 0]], emb[links[:, 1]]
    b = len(links)
    eye = np.eye(b)
    scores = im @ s.T
    sdiag = eye * scores
    sexp = np.exp(alpha * scores)
    sexp = sexp - sexp * eye
    ldiag = -np.log(1 + np.maximum(sdiag.sum(0), 0))
    return (np.log(1 + sexp.sum(0)) / alpha + np.log(1 + sexp.sum(1)) / alpha
            + ldiag * beta).sum() / b


def test_nca_matches_naive():
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(25, 8)).astype(np.float32)
    links = rng.choice(25, size=(7, 2), replace=False).astype(np.int32)
    got = nca_loss(jnp.asarray(emb), jnp.asarray(links), alpha=15, beta=10)
    want = naive_nca(emb, links, 15, 10)
    np.testing.assert_allclose(float(got), want, rtol=5e-3)
