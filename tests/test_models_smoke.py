"""End-to-end smoke: every model family initializes, steps, and learns on
the synthetic KG (loss decreases; eval runs)."""

import dataclasses

import numpy as np
import pytest

from snag_tpu.train.runner import Runner
from snag_tpu.utils.logging import create_logger

MODELS = ["SNAG", "MEAformer", "MCLEA", "EVA", "MSNEA"]


def _cfg_for(synth_cfg, model_name):
    # noise off here: per-epoch noise resampling makes a 4-epoch
    # loss-decrease check flaky (the noise path is covered by
    # test_snag_learns_alignment and tests/test_noise.py)
    cfg = dataclasses.replace(synth_cfg, model_name=model_name, add_noise=0)
    if model_name == "EVA":
        cfg = dataclasses.replace(cfg, structure_encoder="gcn")
    return cfg


@pytest.mark.parametrize("model_name", MODELS)
def test_model_trains(synth_cfg, synth_data, model_name):
    cfg = _cfg_for(synth_cfg, model_name)
    logger = create_logger(name=f"test_{model_name}")
    data = synth_data
    if model_name == "MSNEA":
        # MSNEA augments triples from train links and its margin loss is
        # noisy batch-to-batch (random triple corruption) — judge learning
        # by alignment MRR over a longer fixed-LR horizon instead.
        import dataclasses as dc
        from snag_tpu.data.dataset import load_data
        cfg = dc.replace(cfg, epoch=60, scheduler="fixed", lr=2e-3)
        data = load_data(cfg)
        runner = Runner(cfg, logger, data=data)
        for e in range(60):
            runner.epoch = e
            loss = runner.train_epoch()
        assert np.isfinite(loss)
        res = runner.evaluate()
        assert res.mrr_l2r > 0.5, res.mrr_l2r
        return

    runner = Runner(cfg, logger, data=data)
    first_loss = runner.train_epoch()
    for _ in range(3):
        runner.epoch += 1
        last_loss = runner.train_epoch()
    assert np.isfinite(first_loss) and np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)

    res = runner.evaluate()
    assert 0.0 <= res.mrr_l2r <= 1.0
    assert res.acc_l2r.shape == (3,)


def test_snag_learns_alignment(synth_cfg, synth_data):
    """A few dozen epochs on the synthetic KG must beat random ranking by a
    wide margin."""
    logger = create_logger(name="test_learn")
    cfg = dataclasses.replace(synth_cfg, epoch=30, eval_epoch=30)
    runner = Runner(cfg, logger, data=synth_data)
    for i in range(30):
        runner.epoch = i
        runner.train_epoch()
    res = runner.evaluate()
    n_test = len(synth_data.test_ill)
    random_mrr = float(np.mean(1.0 / (1 + np.arange(n_test))))
    assert res.mrr_l2r > 5 * random_mrr, (res.mrr_l2r, random_mrr)


def test_snag_with_surface_modalities(synth_cfg, synth_data):
    """6-token fusion path (name/char active)."""
    import dataclasses as dc
    from snag_tpu.data.dataset import load_data
    cfg = dc.replace(synth_cfg, use_surface=1, w_name=True, w_char=True,
                     inner_view_num=6, add_noise=0)
    cfg.max_position_embeddings = 7
    cfg.modal_num = len(cfg.active_modalities())
    assert cfg.modal_num == 6
    data = load_data(cfg)
    runner = Runner(cfg, create_logger(name="surface"), data=data)
    l0 = runner.train_epoch()
    runner.epoch = 1
    l1 = runner.train_epoch()
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0
    res = runner.evaluate()
    assert res.mrr_l2r > 0


def test_batch_encode_matches_full_encoding(synth_cfg, synth_data):
    """--batch_encode runs projections/fusion on the batch's rows only;
    the loss (and its gradients) must equal the full-table encoding."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features

    for model_name in ("SNAG", "MEAformer", "MCLEA", "EVA"):
        base = dataclasses.replace(
            synth_cfg, model_name=model_name, add_noise=0, dropout=0.0,
            structure_encoder="gcn" if model_name == "EVA" else "gat")
        feats = prepare_features(base, synth_data)
        links = jnp.asarray(synth_data.train_ill[:16].astype(np.int64))
        valid = jnp.ones((16,), bool)
        rng = jax.random.PRNGKey(0)

        losses = {}
        for be in (0, 1):
            cfg = dataclasses.replace(base, batch_encode=be)
            model = build_model(cfg, synth_data)
            variables = model.init({"params": rng, "dropout": rng}, links,
                                   valid, feats, synth_data.graph,
                                   deterministic=True)

            def f(params):
                loss, _ = model.apply({"params": params}, links, valid,
                                      feats, synth_data.graph,
                                      deterministic=True)
                return loss

            loss, grads = jax.value_and_grad(f)(variables["params"])
            losses[be] = (float(loss), grads)
        l0, g0 = losses[0]
        l1, g1 = losses[1]
        assert abs(l0 - l1) / max(abs(l0), 1e-9) < 1e-4, (model_name, l0, l1)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5,
                                       err_msg=model_name)
