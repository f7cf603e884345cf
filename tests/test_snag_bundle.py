"""Fused SNAG loss bundle (ECIA + factored GMI) vs explicit construction.

Checks (CPU):
1. the dense factored bundle's mixture channels equal the NT-Xent of the
   explicitly-built joint embeddings (the reference formulation);
2. the streaming Pallas kernels (interpret mode) match the dense bundle
   in values and in gradients wrt every differentiable input;
3. the SNAG model computes the same total loss with the bundle on or off.
"""

import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np

import snag_tpu.ops.pallas.snag_loss_kernel as sk
from snag_tpu.losses.contrastive import (_bundle_dense, _icl_xent_batched,
                                         snag_bundle_losses)


def _setup(m=3, b=40, d=16, seed=0, with_valid=True):
    rng = np.random.default_rng(seed)

    def unit(shape):
        x = rng.normal(size=shape)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    zis = jnp.asarray(unit((m, b, d)).astype(np.float32))
    zjs = jnp.asarray(unit((m, b, d)).astype(np.float32))
    a_i = jnp.asarray(unit((b, m)).astype(np.float32) ** 2) ** 0.5
    a_i = a_i / jnp.linalg.norm(a_i, axis=1, keepdims=True)
    a_j = jnp.asarray(unit((b, m)).astype(np.float32) ** 2) ** 0.5
    a_j = a_j / jnp.linalg.norm(a_j, axis=1, keepdims=True)
    u = jnp.asarray(np.abs(rng.normal(size=(m,))).astype(np.float32))
    beta = u / u.sum()
    w_min = jnp.asarray(np.abs(rng.normal(size=(m, b))).astype(np.float32))
    valid = (jnp.asarray(np.arange(b) < b - 7) if with_valid else None)
    return zis, zjs, a_i, a_j, beta, w_min, valid


def test_dense_mixture_channels_match_explicit_joint():
    zis, zjs, a_i, a_j, beta, w_min, valid = _setup()
    tau, ab = 0.1, 0.6
    per = _bundle_dense(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab)
    m, b, d = zis.shape

    # explicit attention-weighted joint: concat_m a[:, m] * z_m (unit rows)
    ji = jnp.concatenate([a_i[:, k:k + 1] * zis[k] for k in range(m)], 1)
    jj = jnp.concatenate([a_j[:, k:k + 1] * zjs[k] for k in range(m)], 1)
    want_att = _icl_xent_batched(ji[None], jj[None], None, valid, tau, ab)[0]
    np.testing.assert_allclose(per[m], want_att, rtol=2e-5, atol=2e-5)

    # explicit fz joint: concat_m sqrt(beta_m) * z_m
    sb = jnp.sqrt(beta)
    fi = jnp.concatenate([sb[k] * zis[k] for k in range(m)], 1)
    fj = jnp.concatenate([sb[k] * zjs[k] for k in range(m)], 1)
    want_fz = _icl_xent_batched(fi[None], fj[None], None, valid, tau, ab)[0]
    np.testing.assert_allclose(per[m + 1], want_fz, rtol=2e-5, atol=2e-5)

    # modality channels equal the batched ICL with the same weights
    want_mod = _icl_xent_batched(zis, zjs, w_min, valid, tau, ab)
    np.testing.assert_allclose(per[:m], want_mod, rtol=2e-5, atol=2e-5)


def test_streamed_bundle_matches_dense_values_and_grads():
    zis, zjs, a_i, a_j, beta, w_min, valid = _setup(m=4, b=24, d=8, seed=3)
    tau, ab = 0.1, 0.5
    g = jnp.asarray(np.linspace(0.5, 1.5, 6).astype(np.float32))

    def scalar(fn):
        def f(zis, zjs, a_i, a_j, beta, w_min):
            per = fn(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab)
            return (per * g).sum()
        return f

    dense = scalar(_bundle_dense)
    want_val = dense(zis, zjs, a_i, a_j, beta, w_min)
    want_gr = jax.grad(dense, argnums=(0, 1, 2, 3, 4, 5))(
        zis, zjs, a_i, a_j, beta, w_min)

    with mock.patch.object(sk, "FORCE_INTERPRET", True), \
            mock.patch.object(sk, "RT_F", 8), mock.patch.object(sk, "RT_B", 8):
        def streamed(zis, zjs, a_i, a_j, beta, w_min, valid, tau, ab):
            return snag_bundle_losses(zis, zjs, a_i, a_j, beta,
                                      w_min=w_min, valid=valid, tau=tau,
                                      ab_weight=ab)
        f = scalar(streamed)
        got_val = f(zis, zjs, a_i, a_j, beta, w_min)
        got_gr = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            zis, zjs, a_i, a_j, beta, w_min)

    np.testing.assert_allclose(got_val, want_val, rtol=3e-5, atol=3e-5)
    names = ("d_zis", "d_zjs", "d_a_i", "d_a_j", "d_beta", "d_w_min")
    for name, a, b_ in zip(names, got_gr, want_gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_snag_model_bundle_on_off_same_loss():
    import dataclasses
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features
    from snag_tpu.train.step import create_train_state
    import optax

    base = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=16, lr=1e-3,
        hidden_units="32,32,32", heads="2,2", attr_dim=32, img_dim=32,
        name_dim=32, char_dim=32, hidden_size=32, intermediate_size=64,
        num_attention_heads=2, num_hidden_layers=1, structure_encoder="gat",
        scheduler="cos", tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4,
        add_noise=0, random_seed=7, synth_ents=60, synth_triples=200,
        synth_img_dim=32, exp_name="t", data_rate=0.3, dtype="float32")
    base = finalize_config(base, data_root="/tmp/snag_bundle_test")
    data = load_data(base)
    feats = prepare_features(base, data)
    links = jnp.asarray(data.train_ill[:16].astype(np.int64))
    valid = jnp.ones((links.shape[0],), bool)

    losses = {}
    for flag in (1, 0):
        cfg = dataclasses.replace(base, fused_snag_loss=flag)
        model = build_model(cfg, data)
        state = create_train_state(cfg, model, feats, data.graph,
                                   optax.sgd(1e-3), cfg.random_seed)
        loss, _ = model.apply({"params": state.params}, links, valid, feats,
                              data.graph, deterministic=True)
        losses[flag] = float(loss)
    assert abs(losses[1] - losses[0]) < 1e-4, losses
