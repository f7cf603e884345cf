"""100K geometry through the production data:8 mesh path (VERDICT r3 next
item 3): the Runner with --mesh_shape data:8 on an 8-device virtual CPU
mesh at 100K entities / ~1M directed edges — one full training epoch +
sharded full-rank eval, asserting finite loss and valid metrics.

Equivalence vs single-device is gated at 30K by
tests/test_mesh_runner.py::test_runner_mesh_matches_single_device_30k
(SNAG_MESH_30K=1); this script proves the same path *executes* at the
OEA-100K scale, where a single-device CPU co-run would take hours.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=/root/repo python scripts/mesh_100k_check.py
Env: MESH_ENTS / MESH_TRIPLES to change the geometry.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# 8 emulated devices timesharing 1 physical core: device threads reach each
# collective minutes apart at this scale, tripping XLA CPU's default 40 s
# rendezvous hard-abort — raise it (must happen before backend init)
flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.train.runner import Runner
    from snag_tpu.utils.logging import create_logger

    assert len(jax.devices()) >= 8, (
        "need XLA_FLAGS=--xla_force_host_platform_device_count=8; "
        f"have {jax.devices()}")

    ents = int(os.environ.get("MESH_ENTS", "100000"))
    triples = int(os.environ.get("MESH_TRIPLES", "500000"))
    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=ents, synth_rels=2000, synth_triples=triples,
        synth_img_dim=2048, exp_name="mesh100k", data_rate=0.3,
        mesh_shape="data:8",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_100k_data")

    t0 = time.time()
    runner = Runner(cfg, create_logger(name="mesh100k"))
    build_s = time.time() - t0
    assert runner.mesh is not None and runner.mesh.devices.size == 8

    t0 = time.time()
    loss = runner.train_epoch()
    epoch_s = time.time() - t0
    assert np.isfinite(loss), f"non-finite loss: {loss}"

    t0 = time.time()
    res = runner.evaluate()
    eval_s = time.time() - t0
    assert 0.0 <= res.mrr_l2r <= 1.0

    print(json.dumps({
        "metric": "mesh_100k_check", "n_entities": ents,
        "n_edges": int(runner.graph.row.shape[0]),
        "mesh": "data:8 (virtual CPU)",
        "build_s": round(build_s, 1), "epoch_s": round(epoch_s, 1),
        "epoch_loss": round(float(loss), 4),
        "sharded_eval_s": round(eval_s, 1),
        "eval_mrr_smoke": round(float(res.mrr_l2r), 4),
    }))


if __name__ == "__main__":
    main()
