"""Full mid-training checkpoint/resume.

The reference only pickles final weights (SNAG_MMEA/main.py:481-500); the
rebuild adds what SURVEY §5.4 calls for: optimizer state, epoch, the grown
train set, IL pools/candidates, early-stop counters and the RNG base key,
so a preempted run resumes exactly.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def _to_np(tree):
    """Pytree -> msgpack-safe nested dict of numpy arrays (tuples/namedtuples
    in optax states become index-keyed dicts via to_state_dict)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x), flax.serialization.to_state_dict(tree))


def save_checkpoint(runner, path: str) -> str:
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    il = runner.il_state
    payload: Dict[str, Any] = {
        "params": _to_np(runner.state.params),
        "opt_state": _to_np(runner.state.opt_state),
        "step": np.asarray(runner.state.step),
        "base_key": np.asarray(runner.state.base_key),
        "epoch": runner.epoch,
        "stage": runner.stage,
        "lr": runner._lr,
        "best_mrr": runner.best_mrr,
        "early_stop_count": runner.early_stop_count,
        "train_ill": runner.train_ill,
        "best_params": (_to_np(runner.best_params)
                        if runner.best_params is not None else None),
        "il": None if il is None else {
            "left_cand": np.asarray(il.left_cand),
            "left_valid": np.asarray(il.left_valid),
            "right_cand": np.asarray(il.right_cand),
            "right_valid": np.asarray(il.right_valid),
            "cand_right": np.asarray(il.cand_right),
        },
        "replay_neg": (np.asarray(runner.replay_neg)
                       if runner.replay_neg is not None else None),
        "replay_ready": runner.replay_ready,
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(runner, path: str) -> None:
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())

    from snag_tpu.train.step import TrainState
    from snag_tpu.train import il as il_mod

    params = flax.serialization.from_state_dict(runner.state.params,
                                                payload["params"])
    opt_state = flax.serialization.from_state_dict(runner.state.opt_state,
                                                   payload["opt_state"])
    runner.state = TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        opt_state=jax.tree_util.tree_map(jnp.asarray, opt_state),
        step=jnp.asarray(payload["step"]),
        base_key=jnp.asarray(payload["base_key"]))
    runner.epoch = int(payload["epoch"])
    runner.stage = int(payload["stage"])
    runner._lr = float(payload["lr"])
    runner.best_mrr = float(payload["best_mrr"])
    runner.early_stop_count = int(payload["early_stop_count"])
    runner.train_ill = np.asarray(payload["train_ill"])
    if payload.get("best_params") is not None:
        bp = flax.serialization.from_state_dict(runner.state.params,
                                                payload["best_params"])
        runner.best_params = jax.tree_util.tree_map(jnp.asarray, bp)
    if payload.get("il") is not None and runner.il_state is not None:
        il = payload["il"]
        runner.il_state = il_mod.ILState(
            left_cand=jnp.asarray(il["left_cand"]),
            left_valid=jnp.asarray(il["left_valid"]),
            right_cand=jnp.asarray(il["right_cand"]),
            right_valid=jnp.asarray(il["right_valid"]),
            cand_right=jnp.asarray(il["cand_right"]))
    if payload.get("replay_neg") is not None:
        runner.replay_neg = jnp.asarray(payload["replay_neg"])
        runner.replay_ready = bool(payload["replay_ready"])


# ---------------------------------------------------------------------------
# MKGC checkpoints (same msgpack format; the MKGC state is smaller — no IL
# pools/replay, but the early-stop bookkeeping must survive a resume so an
# 8000-epoch run preempted mid-way stops at the same eval it would have)
# ---------------------------------------------------------------------------

def save_mkgc_checkpoint(runner, path: str) -> str:
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    payload: Dict[str, Any] = {
        "params": _to_np(runner.state.params),
        "opt_state": _to_np(runner.state.opt_state),
        "step": np.asarray(runner.state.step),
        "base_key": np.asarray(runner.state.base_key),
        "epoch": runner.epoch,
        "best_mrr": runner.best_mrr,
        "bad_evals": runner.bad_evals,
        "best_params": (_to_np(runner.best_params)
                        if runner.best_params is not None else None),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)   # atomic: a crash mid-write never corrupts
    return path


def load_mkgc_checkpoint(runner, path: str) -> None:
    from snag_tpu.mkgc.train import MKGCState

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    params = flax.serialization.from_state_dict(runner.state.params,
                                                payload["params"])
    opt_state = flax.serialization.from_state_dict(runner.state.opt_state,
                                                   payload["opt_state"])
    runner.state = MKGCState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        opt_state=jax.tree_util.tree_map(jnp.asarray, opt_state),
        step=jnp.asarray(payload["step"]),
        base_key=jnp.asarray(payload["base_key"]))
    runner.epoch = int(payload["epoch"])
    runner.best_mrr = float(payload["best_mrr"])
    runner.bad_evals = int(payload["bad_evals"])
    if payload.get("best_params") is not None:
        bp = flax.serialization.from_state_dict(runner.state.params,
                                                payload["best_params"])
        runner.best_params = jax.tree_util.tree_map(jnp.asarray, bp)
