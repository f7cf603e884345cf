"""Full Runner.run() with iterative learning on the synthetic KG: stage
transition, mining, promotion, early stopping machinery."""

import dataclasses

import numpy as np

from snag_tpu.train.runner import Runner
from snag_tpu.utils.logging import create_logger


def test_full_run_with_il(synth_cfg, synth_data):
    cfg = dataclasses.replace(
        synth_cfg, epoch=14, il=True, il_start=2, semi_learn_step=1,
        eval_epoch=2, add_noise=0, csls=True, csls_k=3, log_every=100)
    runner = Runner(cfg, create_logger(name="il_run"), data=synth_data)
    n_train_before = len(runner.train_ill)
    res = runner.run()

    assert runner.stage == 1                      # transition happened
    assert len(runner.train_ill) > n_train_before  # promotion grew the set
    assert res.mrr_l2r > 0.9                      # easy synthetic task
    # pools drained by promotion
    lv = int(np.asarray(runner.il_state.left_valid).sum())
    assert lv < len(synth_data.left_non_train)


def test_chunked_mining_matches_full(synth_cfg, synth_data):
    import jax.numpy as jnp
    import snag_tpu.train.il as il_mod
    rng = np.random.default_rng(0)
    n = synth_data.ent_num
    emb = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    il = il_mod.ILState.init(synth_data.left_non_train,
                             synth_data.right_non_train)
    full = il_mod.mine_new_links(emb, il.left_cand, il.left_valid,
                                 il.right_cand, il.right_valid,
                                 il.cand_right, True)
    pl, pr = il_mod._mutual_argmins_chunked(
        emb, il.left_cand, il.left_valid, il.right_cand, il.right_valid,
        chunk=8)
    chunked = il_mod._mine_from_preds(il.left_cand, il.left_valid,
                                      il.right_cand, il.right_valid,
                                      il.cand_right, pl, pr, jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))
