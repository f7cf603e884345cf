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
