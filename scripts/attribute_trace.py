"""Join the xplane trace's per-op times with the step HLO's op_name
metadata to attribute time per model stage (encoder fwd / bwd, loss,
optimizer, noise, ...).

Run after scripts/trace_step.py:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/attribute_trace.py
"""

from __future__ import annotations

import glob
import re

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from snag_tpu.config import Config, finalize_config
    from snag_tpu.data.dataset import load_data
    from snag_tpu.models import build_model
    from snag_tpu.models.encoder import prepare_features, prepare_stats
    from snag_tpu.train.step import (create_train_state, make_noise_fn,
                                     make_train_step)
    import optax

    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=3500,
        lr=5e-4, hidden_units="300,300,300", heads="2,2",
        attr_dim=300, img_dim=300, name_dim=300, char_dim=300,
        hidden_size=300, intermediate_size=400, num_attention_heads=1,
        num_hidden_layers=1, structure_encoder="gat", scheduler="cos",
        tau=0.1, tau2=4.0, use_surface=0, inner_view_num=4, add_noise=1,
        noise_ratio=0.2, mask_ratio=0.7, random_seed=3408,
        synth_ents=30000, synth_rels=2000, synth_triples=150000,
        synth_img_dim=2048, exp_name="prof", data_rate=0.3,
        dtype="bfloat16",
    )
    cfg = finalize_config(cfg, data_root="/tmp/snag_bench_data")
    data = load_data(cfg)
    feats = prepare_features(cfg, data)
    stats = prepare_stats(feats, data.ent_w_img)
    graph = data.graph
    model = build_model(cfg, data)
    state = create_train_state(cfg, model, feats, graph, optax.sgd(1e-3),
                               cfg.random_seed)
    tx = optax.adamw(1e-4)
    state = type(state)(params=state.params, opt_state=tx.init(state.params),
                        step=jnp.zeros((), jnp.int32), base_key=state.base_key)
    step = make_train_step(cfg, model, tx, stats)
    b = cfg.batch_size
    links = jnp.asarray(data.train_ill[:b].astype(np.int64))
    if links.shape[0] < b:
        reps = -(-b // links.shape[0])
        links = jnp.tile(links, (reps, 1))[:b]
    valid = jnp.ones((b,), dtype=bool)
    noise_fn = make_noise_fn(cfg, stats)
    nfeats, _ = noise_fn(state.base_key, feats, jnp.asarray(0))
    lowered = step.lower(state, links, valid, nfeats, graph, jnp.asarray(0))
    txt = lowered.compile().as_text()

    # map instruction name -> op_name metadata
    metamap = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?metadata=\{[^}]*op_name=\"([^\"]*)\"",
            txt):
        metamap[m.group(1)] = m.group(2)
    print(f"meta entries: {len(metamap)}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    f = sorted(glob.glob("/tmp/snag_trace/plugins/profile/*/vm.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())

    def classify(op_name: str) -> str:
        if not op_name:
            return "unattributed"
        s = op_name
        bwd = ("transpose" in s) or ("_bwd" in s) or ("vjp" in s.lower())
        if "adamw" in s or "adam" in s or "apply_updates" in s or "update" in s.split("/")[0]:
            stage = "optimizer"
        if "gat_attention" in s or "cross_graph_model" in s or "gat" in s:
            return "gat_bwd" if bwd else "gat_fwd"
        if "fusion/" in s or "BertLayer" in s.lower() or "layer_0" in s:
            return "mformer_bwd" if bwd else "mformer_fwd"
        if ("icl" in s or "contrastive" in s or "loss" in s or "xent" in s
                or "logsumexp" in s):
            return "loss_bwd" if bwd else "loss_fwd"
        if "_fc" in s or "Dense" in s:
            return "proj_bwd" if bwd else "proj_fwd"
        if "noise" in s or "bernoulli" in s or "random" in s or "threefry" in s or "rng" in s:
            return "rng_noise"
        if "adamw" in s or "adam" in s or "chain" in s or "multi_transform" in s:
            return "optimizer"
        return "other_bwd" if bwd else "other"

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        line = [l for l in plane.lines if l.name == "XLA Ops"][0]
        stages = {}
        unk = {}
        for ev in line.events:
            nm = ev_meta.get(ev.metadata_id, "?")
            instr = nm.split(" = ")[0].strip().lstrip("%")
            op_name = metamap.get(instr, "")
            st = classify(op_name)
            stages[st] = stages.get(st, 0) + ev.duration_ps
            if st in ("other", "other_bwd", "unattributed"):
                unk[(instr, op_name[:90])] = unk.get((instr, op_name[:90]), 0) \
                    + ev.duration_ps
        print("== stage attribution (ms/step) ==")
        for stg, ps in sorted(stages.items(), key=lambda kv: -kv[1]):
            print(f"  {ps/1e9/3:8.2f}  {stg}")
        print("== top unattributed/other ==")
        for (instr, opn), ps in sorted(unk.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {ps/1e9/3:7.2f}  {instr[:40]:40s} {opn}")

        # drill into one stage: STAGE=gat_bwd python scripts/attribute_trace.py
        import os
        want = os.environ.get("STAGE")
        if want:
            per_op = {}
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "?")
                instr = nm.split(" = ")[0].strip().lstrip("%")
                op_name = metamap.get(instr, "")
                if classify(op_name) != want:
                    continue
                per_op[(instr, op_name[:110])] = \
                    per_op.get((instr, op_name[:110]), 0) + ev.duration_ps
            print(f"== top ops in stage {want} ==")
            for (instr, opn), ps in sorted(per_op.items(),
                                           key=lambda kv: -kv[1])[:25]:
                print(f"  {ps/1e9/3:7.2f}  {instr[:44]:44s} {opn}")


if __name__ == "__main__":
    main()
