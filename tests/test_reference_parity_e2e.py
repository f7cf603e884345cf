"""End-to-end metric parity vs the actual PyTorch reference binary.

Exports a synthetic KG in the reference's on-disk format, trains BOTH the
unmodified reference (/root/reference/SNAG_MMEA/main.py via the CPU shim
runner) and snag_tpu on the identical files — same seed, therefore the
identical train/test split — and asserts the final test MRR agrees within
the BASELINE.json tolerance (0.5 pt class; we allow 3 pts at this tiny
scale/epoch budget).  This is the oracle VERDICT r1 item 2 called for.
"""

import os
import os.path as osp
import re
import subprocess
import sys

import numpy as np
import pytest

REF_MAIN = "/root/reference/SNAG_MMEA/main.py"
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

FLAGS = [
    "--gpu", "0", "--model_name", "SNAG", "--data_choice", "DBP15K",
    "--data_split", "ja_en", "--data_rate", "0.3",
    "--epoch", "8", "--eval_epoch", "4", "--lr", "5e-4",
    "--hidden_units", "64,64,64", "--batch_size", "256",
    "--csls", "--csls_k", "3", "--random_seed", "3408", "--scheduler", "cos",
    "--attr_dim", "64", "--img_dim", "64", "--name_dim", "64",
    "--char_dim", "64", "--hidden_size", "64", "--intermediate_size", "128",
    "--tau", "0.1", "--tau2", "4.0", "--structure_encoder", "gat",
    "--num_attention_heads", "1", "--num_hidden_layers", "1",
    "--use_surface", "0", "--use_intermediate", "1",
    "--add_noise", "1", "--noise_ratio", "0.2", "--mask_ratio", "0.7",
]


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_reference_and_snag_tpu_agree_on_identical_files(tmp_path):
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / "refdata")
    export_reference_format(data_root, n_ents=800, n_rels=20,
                            n_triples=3200, img_dim=64, seed=0)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # torch subprocess; jax env irrelevant
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "run_reference_cpu.py"),
         *FLAGS, "--data_path", data_root, "--workers", "1",
         "--exp_name", "parity", "--exp_id", "P1"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout + proc.stderr
    # final test line: "Res:[h1\th10\tmrr]"
    m = re.findall(r"Res:\[([\d.]+)\t([\d.]+)\t([\d.]+)\]", out)
    assert m, out[-2000:]
    ref_h1, _, ref_mrr = (float(x) for x in m[-1])

    from snag_tpu.config import (build_argparser, config_from_args,
                                 finalize_config)
    from snag_tpu.train.runner import Runner
    from snag_tpu.utils import set_seed
    from snag_tpu.utils.logging import create_logger

    args = build_argparser().parse_args(
        FLAGS + ["--data_path", data_root, "--exp_name", "parity",
                 "--exp_id", "P2", "--no_tensorboard"])
    cfg = finalize_config(config_from_args(args))
    set_seed(cfg.random_seed)
    runner = Runner(cfg, create_logger(name="parity"))
    res = runner.run()

    assert abs(res.mrr_l2r - ref_mrr) < 0.03, (res.mrr_l2r, ref_mrr)
    assert abs(float(res.acc_l2r[0]) - ref_h1) < 0.05


# --------------------------------------------------------------------------
# Sharpened oracle (VERDICT r2 item 3): hard non-saturated operating points,
# trajectory comparison, the IL stage transition, surface modalities, and
# the non-SNAG model families — all co-run with the reference binary on
# identical files.
# --------------------------------------------------------------------------

HARD = dict(n_ents=800, n_rels=20, n_triples=3200, img_dim=64, seed=0,
            noise=1.2, mirror_p=0.4, unalignable_frac=0.35)


def _run_reference(data_root, flags, extra=()):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "run_reference_cpu.py"),
         *flags, *extra, "--data_path", data_root, "--workers", "1",
         "--exp_name", "parity", "--exp_id", "R"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout + proc.stderr
    m = re.findall(r"Res:\[([\d.]+)\t([\d.]+)\t([\d.]+)\]", out)
    assert m, out[-2000:]
    h1, _, mrr = (float(x) for x in m[-1])
    traj = [float(x) for x in
            re.findall(r"l2r: acc of top.*?mrr = ([\d.]+)", out)]
    return h1, mrr, traj, out


def _ref_loss_traj(out):
    """Per-epoch training loss from the reference's tqdm description
    (`Train | Ep [i/N] Step [...] LR [...] Loss x` — main.py:189; the value
    is that epoch's summed batch loss, reset by acc_init each epoch)."""
    per_ep = {}
    for m in re.finditer(
            r"Ep \[(\d+)/\d+\] Step \[\d+/\d+\] LR \[[\d.]+\] Loss ([\d.]+)",
            out):
        per_ep[int(m.group(1))] = float(m.group(2))
    return [per_ep[e] for e in sorted(per_ep)]


def _run_ours(data_root, flags, extra=()):
    import logging

    from snag_tpu.config import (build_argparser, config_from_args,
                                 finalize_config)
    from snag_tpu.train.runner import Runner
    from snag_tpu.utils import set_seed
    from snag_tpu.utils.logging import create_logger

    args = build_argparser().parse_args(
        list(flags) + list(extra) + ["--data_path", data_root,
                                     "--exp_name", "parity", "--exp_id", "S",
                                     "--no_tensorboard"])
    cfg = finalize_config(config_from_args(args))
    set_seed(cfg.random_seed)
    logger = create_logger(name=f"parity_{abs(hash(tuple(extra)))%10**6}")

    traj = []
    loss_traj = []

    class _Grab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            m = re.search(r"l2r: acc of top.*?mrr = ([\d.]+)", msg)
            if m:
                traj.append(float(m.group(1)))
            m = re.search(r"Ep \[\d+/\d+\] Step \[\d+\].*?Loss ([\d.]+)", msg)
            if m:
                loss_traj.append(float(m.group(1)))

    logger.addHandler(_Grab())
    runner = Runner(cfg, logger)
    res = runner.run()
    return float(res.acc_l2r[0]), float(res.mrr_l2r), traj, loss_traj


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_hard_point_parity_and_trajectory(tmp_path):
    """Non-saturated oracle: the reference lands at MRR ~0.5-0.7 here, so a
    subtly broken loss term shifts the final metric well outside tolerance
    (unlike the saturated ~0.997 anchor above)."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / "hard")
    export_reference_format(data_root, **HARD)

    flags = [f if f != "8" else "10" for f in FLAGS]   # epoch 8 -> 10
    flags[flags.index("--eval_epoch") + 1] = "5"
    ref_h1, ref_mrr, ref_traj, ref_out = _run_reference(data_root, flags)
    our_h1, our_mrr, our_traj, our_loss = _run_ours(
        data_root, flags, ("--log_every", "1"))

    assert 0.2 < ref_mrr < 0.9, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.05, (our_mrr, ref_mrr)
    assert abs(our_h1 - ref_h1) < 0.07, (our_h1, ref_h1)
    # eval-by-eval trajectory shape (both log every eval + final tests)
    n = min(len(ref_traj), len(our_traj))
    assert n >= 2, (ref_traj, our_traj)
    for a, b in zip(ref_traj[:n], our_traj[:n]):
        assert abs(a - b) < 0.10, (ref_traj, our_traj)

    # Training-LOSS trajectory: catches loss-term bugs (e.g. tau, self-mask)
    # that converged NT-Xent *rankings* are insensitive to.  Calibration at
    # this operating point (2026-08-18): ref per-epoch loss 54.2->47.7
    # (drop 6.4); ours 57.4->52.4 (drop 5.0); ours with tau broken 0.1->0.3
    # 53.4->51.4 (drop 2.05, fails the drop-ratio gate).  Absolute values
    # carry a seed/init offset of up to ~9% (seed 17 vs 3408 moves ours by
    # +4), so the per-epoch bound is loose and the DROP ratio is the sharp
    # discriminator.
    ref_loss = _ref_loss_traj(ref_out)
    assert len(ref_loss) >= 8 and len(our_loss) >= 8, (ref_loss, our_loss)
    k = min(len(ref_loss), len(our_loss))
    for a, b in zip(ref_loss[:k], our_loss[:k]):
        assert abs(a - b) / max(a, b) < 0.20, (ref_loss, our_loss)
    ref_drop = max(ref_loss) - ref_loss[-1]
    our_drop = max(our_loss) - our_loss[-1]
    assert our_drop > 0.5 * ref_drop, (ref_loss, our_loss)
    assert ref_drop > 0.5 * our_drop, (ref_loss, our_loss)

    # Negative control: the oracle must CATCH a deliberately-broken loss
    # term.  tau 0.1 -> 0.3 leaves the final MRR within tolerance (converged
    # rankings are robust to it) but flattens the loss drop below the gate.
    _, bad_mrr, _, bad_loss = _run_ours(
        data_root, flags, ("--log_every", "1", "--tau", "0.3"))
    bad_drop = max(bad_loss) - bad_loss[-1]
    assert bad_drop < 0.5 * ref_drop, (
        "oracle lost sensitivity: broken tau passed the drop gate",
        ref_loss, bad_loss)


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_il_stage_parity(tmp_path):
    """--il through the stage transition (lr/5, 3x horizon, best reload,
    main.py:158-183) with mining every epoch and one data refresh at epoch
    9 ((epoch+1) %% (semi_learn_step*10) == 0)."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / "il")
    export_reference_format(data_root, **{**HARD, "noise": 0.8,
                                          "unalignable_frac": 0.2})

    flags = list(FLAGS)
    flags[flags.index("--epoch") + 1] = "14"
    flags[flags.index("--eval_epoch") + 1] = "4"
    il = ["--il", "--il_start", "3", "--semi_learn_step", "1"]
    ref_h1, ref_mrr, _, ref_out = _run_reference(data_root, flags, il)
    our_h1, our_mrr, _, _ = _run_ours(data_root, flags, il)

    assert 0.2 < ref_mrr < 0.98, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.06, (our_mrr, ref_mrr)
    # the reference actually exercised the IL machinery
    assert "#links in candidate set" in ref_out


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_surface_modality_parity(tmp_path):
    """Name/char surface path co-run: the export writes the reference's
    translated_ent_name JSON + a fake GloVe covering every word
    (src/data.py:318-365), so both frameworks compute identical surface
    features."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / "surf")
    export_reference_format(data_root, with_surface=True, **HARD)

    flags = list(FLAGS)
    flags[flags.index("--use_surface") + 1] = "1"
    flags[flags.index("--epoch") + 1] = "10"
    flags[flags.index("--eval_epoch") + 1] = "5"
    ref_h1, ref_mrr, _, _ = _run_reference(data_root, flags)
    our_h1, our_mrr, _, _ = _run_ours(data_root, flags)

    assert 0.2 < ref_mrr < 0.98, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.05, (our_mrr, ref_mrr)


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
@pytest.mark.parametrize("model,extra", [
    ("MEAformer", ()),
    ("MCLEA", ()),
    ("EVA", ("--structure_encoder", "gcn")),
])
def test_other_model_families_parity(tmp_path, model, extra):
    """MEAformer / MCLEA / EVA through the reference binary at the hard
    operating point (main.py:502-529 dispatch) — VERDICT r2 missing item 1's
    multi-model coverage."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / model)
    export_reference_format(data_root, **HARD)

    flags = list(FLAGS)
    flags[flags.index("--model_name") + 1] = model
    flags[flags.index("--epoch") + 1] = "10"
    flags[flags.index("--eval_epoch") + 1] = "5"
    if extra:
        flags[flags.index("--structure_encoder") + 1] = extra[1]
    ref_h1, ref_mrr, _, _ = _run_reference(data_root, flags)
    our_h1, our_mrr, _, _ = _run_ours(data_root, flags)

    assert 0.05 < ref_mrr < 0.98, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.06, (our_mrr, ref_mrr)


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
@pytest.mark.parametrize("choice,split,ratio", [
    ("OEA_D_W_15K_V1", "norm", "1.0"),
    ("FBDB15K", "norm", "0.4"),
    ("DWY", "dbp_wd_15k_V1", "1.0"),
])
def test_dataset_layout_parity(tmp_path, choice, split, ratio):
    """OEA / FB / DWY on-disk layout co-run (VERDICT r3 next item 6, r4
    missing item 2): exercises the reference's pickle-resolution branches
    (src/data.py:155-172 — OpenEA dir without a split subdir + OpenEA/pkl
    naming; FB's pkls/<choice> naming with the _ratio suffix and the forced
    norm/4-view config, config.py:158-166; DWY's <choice>/<split> dir whose
    V1/V2 split name routes the image pickle through OpenEA/pkl/<choice>_*)
    against OUR loader's same branches (data/io.py::resolve_img_pickle,
    data/dataset.py::_load_files) on identical files."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / choice)
    export_reference_format(data_root, data_choice=choice, data_split=split,
                            ratio=ratio, **HARD)

    flags = list(FLAGS)
    flags[flags.index("--data_choice") + 1] = choice
    flags[flags.index("--data_split") + 1] = split
    flags += ["--ratio", ratio]
    ref_h1, ref_mrr, _, _ = _run_reference(data_root, flags)
    our_h1, our_mrr, _, _ = _run_ours(data_root, flags)

    assert 0.05 < ref_mrr < 0.98, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.05, (our_mrr, ref_mrr)


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_msnea_parity(tmp_path):
    """MSNEA through the reference binary — the fifth model family.

    --add_noise 0: the reference's own MSNEA lacks update_noise and crashes
    under --add_noise 1 (SURVEY §2.6 latent-bug note).  MSNEA's negative
    triples come from host-side random sampling the two frameworks cannot
    seed identically, so the tolerance is the loose cross-seed spread
    (calibration 2026-08-18: ref 0.631/0.620 at seeds 3408/17, ours
    0.614/0.647 — spread ~±0.03)."""
    from snag_tpu.data.export_reference import export_reference_format
    data_root = str(tmp_path / "msnea")
    export_reference_format(data_root, **HARD)

    flags = list(FLAGS)
    flags[flags.index("--epoch") + 1] = "6"
    flags[flags.index("--eval_epoch") + 1] = "3"
    flags[flags.index("--model_name") + 1] = "MSNEA"
    flags[flags.index("--add_noise") + 1] = "0"
    ref_h1, ref_mrr, _, _ = _run_reference(data_root, flags)
    our_h1, our_mrr, _, _ = _run_ours(data_root, flags)

    assert 0.2 < ref_mrr < 0.98, f"oracle saturated/broken: {ref_mrr}"
    assert abs(our_mrr - ref_mrr) < 0.06, (our_mrr, ref_mrr)
    assert abs(our_h1 - ref_h1) < 0.08, (our_h1, ref_h1)
