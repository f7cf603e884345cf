"""Reference-checkpoint import: identical weights => identical rankings.

Trains the unmodified reference binary with ``--save_model 1``, imports the
resulting torch state_dict into our param tree
(snag_tpu/utils/import_reference.py), and evaluates with OUR encoder +
evaluator on the identical files.  This is the strongest eval-function
parity oracle in the suite: any deviation in the encoder math (GAT edge
multiset, fusion weighting, projection orientation) shifts the metrics
immediately — the round-3 graph-coalescing fix (data/graph.py) was found
exactly this way (embeddings agree to ~7e-9 after it; before it the GAT
double-counted bidirectional neighbors and MRR was off by 0.005).

Reference save format: torch.save(model.state_dict(), <data>/<model>/save/
<name>.pkl)  (SNAG_MMEA/main.py:481-500).
"""

import glob
import os
import os.path as osp
import re
import subprocess
import sys

import pytest

REF_MAIN = "/root/reference/SNAG_MMEA/main.py"
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

FLAGS = [
    "--gpu", "0", "--model_name", "SNAG", "--data_choice", "DBP15K",
    "--data_split", "ja_en", "--data_rate", "0.3",
    "--epoch", "10", "--eval_epoch", "5", "--lr", "5e-4",
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
@pytest.mark.parametrize("model,enc,surface", [
    ("SNAG", "gat", 0), ("SNAG", "gat", 1), ("MEAformer", "gat", 0),
    ("MCLEA", "gat", 0), ("EVA", "gcn", 0)])
def test_reference_checkpoint_import_matches_eval(tmp_path, model, enc,
                                                  surface):
    from snag_tpu.data.export_reference import export_reference_format

    # img_coverage=1.0: the missing-image fill is a random draw seeded
    # independently per framework, so full coverage keeps the comparison
    # exact (synthetic.generate_synthetic_kg docstring)
    data_root = str(tmp_path / "imp")
    flags = list(FLAGS)
    flags[flags.index("--model_name") + 1] = model
    flags[flags.index("--structure_encoder") + 1] = enc
    flags[flags.index("--use_surface") + 1] = str(surface)
    export_reference_format(data_root, n_ents=800, n_rels=20, n_triples=3200,
                            img_dim=64, seed=0, noise=1.2, mirror_p=0.4,
                            unalignable_frac=0.35, img_coverage=1.0,
                            with_surface=bool(surface))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "run_reference_cpu.py"),
         *flags, "--data_path", data_root, "--workers", "1",
         "--exp_name", "imp", "--exp_id", "SV", "--save_model", "1"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout + proc.stderr
    m = re.findall(r"Res:\[([\d.]+)\t([\d.]+)\t([\d.]+)\]", out)
    assert m, out[-2000:]
    ref_h1, _, ref_mrr = (float(x) for x in m[-1])
    pkls = glob.glob(osp.join(data_root, model, "save", "*.pkl"))
    assert len(pkls) == 1, pkls

    from snag_tpu.config import (build_argparser, config_from_args,
                                 finalize_config)
    from snag_tpu.train.runner import Runner
    from snag_tpu.utils import set_seed
    from snag_tpu.utils.import_reference import import_reference_checkpoint
    from snag_tpu.utils.logging import create_logger

    args = build_argparser().parse_args(
        flags + ["--data_path", data_root, "--exp_name", "imp",
                 "--exp_id", "IM", "--no_tensorboard"])
    cfg = finalize_config(config_from_args(args))
    set_seed(cfg.random_seed)
    runner = Runner(cfg, create_logger(name="imp_test"))
    params = import_reference_checkpoint(runner.state.params, pkls[0])
    res = runner.evaluate(params=params)

    # the reference's saved checkpoint is its best-by-MRR weights — the same
    # weights that produced its final Res line; identical function =>
    # identical rankings (reference logs round to 3-4 decimals)
    assert abs(float(res.mrr_l2r) - ref_mrr) < 2e-3, (res.mrr_l2r, ref_mrr)
    assert abs(float(res.acc_l2r[0]) - ref_h1) < 2e-3, (res.acc_l2r, ref_h1)


@pytest.mark.skipif(not osp.exists(REF_MAIN),
                    reason="reference checkout not present")
def test_export_roundtrip_reference_evaluates_ours(tmp_path):
    """Reverse direction: train snag_tpu, export the params as a reference
    .pkl (export_reference_checkpoint), and have the unmodified reference
    binary evaluate them with --only_test — its Res must equal our own eval
    of the same weights.  Dev calibration 2026-08-18: ours MRR 0.6142 /
    H1 0.5857; reference on the export MRR 0.614 / H1 0.5857 (exact)."""
    from snag_tpu.config import (build_argparser, config_from_args,
                                 finalize_config)
    from snag_tpu.data.export_reference import export_reference_format
    from snag_tpu.train.runner import Runner
    from snag_tpu.utils import set_seed
    from snag_tpu.utils.import_reference import (export_reference_checkpoint,
                                                 load_reference_checkpoint)
    from snag_tpu.utils.logging import create_logger

    data_root = str(tmp_path / "rt")
    export_reference_format(data_root, n_ents=800, n_rels=20, n_triples=3200,
                            img_dim=64, seed=0, noise=1.2, mirror_p=0.4,
                            unalignable_frac=0.35, img_coverage=1.0)

    flags = list(FLAGS)
    flags[flags.index("--epoch") + 1] = "6"
    flags[flags.index("--eval_epoch") + 1] = "3"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # a 1-epoch reference checkpoint of the same config supplies the
    # eval-inert keys our tree doesn't materialize (name_fc/char_fc, AWL)
    tpl_flags = list(flags)
    tpl_flags[tpl_flags.index("--epoch") + 1] = "1"
    tpl_flags[tpl_flags.index("--eval_epoch") + 1] = "1"
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "run_reference_cpu.py"),
         *tpl_flags, "--data_path", data_root, "--workers", "1",
         "--exp_name", "rt", "--exp_id", "T", "--save_model", "1"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    template = load_reference_checkpoint(
        glob.glob(osp.join(data_root, "SNAG", "save", "*.pkl"))[0])

    args = build_argparser().parse_args(
        flags + ["--data_path", data_root, "--exp_name", "rt",
                 "--exp_id", "O", "--no_tensorboard"])
    cfg = finalize_config(config_from_args(args))
    set_seed(cfg.random_seed)
    runner = Runner(cfg, create_logger(name="rt"))
    res = runner.run()
    params = (runner.best_params if runner.best_params is not None
              else runner.state.params)
    export_reference_checkpoint(
        params, osp.join(data_root, "SNAG", "save", "OURS.pkl"),
        template=template)

    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "run_reference_cpu.py"),
         *flags, "--data_path", data_root, "--workers", "1",
         "--exp_name", "rt", "--exp_id", "R", "--only_test", "1",
         "--model_name_save", "OURS"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    m = re.findall(r"Res:\[([\d.]+)\t([\d.]+)\t([\d.]+)\]",
                   proc.stdout + proc.stderr)
    assert m, (proc.stdout + proc.stderr)[-2000:]
    ref_h1, _, ref_mrr = (float(x) for x in m[-1])

    assert abs(float(res.mrr_l2r) - ref_mrr) < 2e-3, (res.mrr_l2r, ref_mrr)
    assert abs(float(res.acc_l2r[0]) - ref_h1) < 2e-3, (res.acc_l2r, ref_h1)
