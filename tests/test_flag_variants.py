"""Optional-flag paths: --awloss, --use_project_head, unsupervised visual
pivot induction, GCN structure encoder for SNAG."""

import dataclasses

import numpy as np

from snag_tpu.data.features import visual_pivot_induction
from snag_tpu.train.runner import Runner
from snag_tpu.utils.logging import create_logger


def _two_epochs(cfg, data):
    r = Runner(cfg, create_logger(name="fv"), data=data)
    l0 = r.train_epoch()
    r.epoch = 1
    l1 = r.train_epoch()
    assert np.isfinite(l0) and np.isfinite(l1)
    return l0, l1


def test_snag_awloss(synth_cfg, synth_data):
    cfg = dataclasses.replace(synth_cfg, awloss=1, add_noise=0)
    l0, l1 = _two_epochs(cfg, synth_data)
    assert l1 < l0


def test_mclea_projection_head(synth_cfg, synth_data):
    cfg = dataclasses.replace(synth_cfg, model_name="MCLEA",
                              use_project_head=True, add_noise=0)
    _two_epochs(cfg, synth_data)


def test_snag_gcn_encoder(synth_cfg, synth_data):
    cfg = dataclasses.replace(synth_cfg, structure_encoder="gcn", add_noise=0)
    l0, l1 = _two_epochs(cfg, synth_data)
    assert l1 < l0


def test_visual_pivot_induction():
    """Mutual top-sim pairs become pseudo links (src/data.py:367-402)."""
    rng = np.random.default_rng(0)
    n = 30
    latent = rng.normal(size=(n, 8))
    feats = np.vstack([latent + 0.01 * rng.normal(size=(n, 8)),
                       latent + 0.01 * rng.normal(size=(n, 8))])
    feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    left = list(range(n))
    right = list(range(n, 2 * n))
    ills = [(i, n + i) for i in range(n)]
    links = visual_pivot_induction(left, right, feats.astype(np.float32),
                                   ills, topk=10)
    assert links.shape == (10, 2)
    correct = sum((int(l), int(r)) in set(ills) for l, r in links)
    assert correct >= 8  # near-identical features -> mostly true pairs


def test_snag_remat_matches_baseline(synth_cfg, synth_data):
    """--remat rematerializes GNN activations in the backward; it must be
    semantics-preserving (same losses, same learning trajectory)."""
    losses = {}
    for remat in (0, 1):
        cfg = dataclasses.replace(synth_cfg, remat=remat)
        losses[remat] = _two_epochs(cfg, synth_data)
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)
