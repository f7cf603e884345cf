"""Optimizer and LR schedules.

Mirrors the reference's ``set_optim`` (SNAG_MMEA/src/utils.py:25-80):

* SNAG gets three param groups — decay / no-decay (``weight_raw``, biases) /
  5x-LR no-decay (any path containing ``multi_loss_layer``, which in the
  reference's substring matching also catches ``multi_loss_layer_2``);
* other models get one AdamW group with global weight decay;
* linear / cosine schedules with 15% warmup (HF get_*_schedule_with_warmup
  semantics, main.py:77-92 computes warmup = 0.15 * total)
* global grad-norm clipping (main.py:272) before the group transforms.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from snag_tpu.config import Config


def make_lr_schedule(cfg: Config, lr: float, total_steps: int,
                     warmup_steps: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    acc = max(cfg.accumulation_steps, 1)
    total = max(int(total_steps / acc), 1)
    warmup = int(warmup_steps / acc)

    if cfg.scheduler == "fixed":
        return lambda step: jnp.asarray(lr)

    if cfg.scheduler == "linear":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = step / jnp.maximum(warmup, 1)
            decay = jnp.maximum(0.0, (total - step) / jnp.maximum(total - warmup, 1))
            return lr * jnp.where(step < warmup, warm, decay)
        return sched

    # cos: HF cosine-with-warmup, num_cycles=0.5
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup, 1)
        progress = (step - warmup) / jnp.maximum(total - warmup, 1)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return lr * jnp.where(step < warmup, warm, cos)
    return sched


def _snag_label_tree(params):
    """Label each leaf by its reference param-group (src/utils.py:46-54)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> str:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if "multi_loss_layer" in joined:
            return "large"
        if "weight_raw" in joined or joined.endswith("bias"):
            return "no_decay"
        return "decay"

    labels = [label_of(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def build_optimizer(cfg: Config, params, total_steps: int,
                    warmup_steps: int, lr: float | None = None):
    """Returns (optax transform, lr schedule for logging)."""
    lr = cfg.lr if lr is None else lr
    sched = make_lr_schedule(cfg, lr, total_steps, warmup_steps)
    sched5 = make_lr_schedule(cfg, 5 * lr, total_steps, warmup_steps)

    def adamw(schedule, wd):
        if cfg.optim == "adam":
            return optax.adam(schedule)
        return optax.adamw(schedule, eps=cfg.adam_epsilon, weight_decay=wd)

    if cfg.model_name == "SNAG":
        tx = optax.multi_transform(
            {"decay": adamw(sched, cfg.weight_decay),
             "no_decay": adamw(sched, 0.0),
             "large": adamw(sched5, 0.0)},
            _snag_label_tree(params))
    else:
        tx = adamw(sched, cfg.weight_decay)

    tx = optax.chain(optax.clip_by_global_norm(cfg.clip), tx)
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx, sched
