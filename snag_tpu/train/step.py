"""Jitted training step and embedding functions.

One training step = one XLA computation (reference hot path: SURVEY §3.2):
epoch-keyed feature noise -> full-graph encode -> batched losses -> grads ->
clip -> optimizer.  The feature-noise blend is recomputed from the epoch key
inside the step instead of storing noisy table copies (see ops/noise.py).

Batches arrive capacity-padded with a validity mask so every step of a run
reuses one compiled program even while iterative learning grows the train
set (the reference rebuilds its DataLoader instead, main.py:226-237).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from snag_tpu.config import Config
from snag_tpu.models.encoder import (FeaturePack, FeatureStats,
                                     apply_feature_noise)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray          # optimizer step counter
    base_key: jax.Array        # constant per run-stage; epoch/step keys fold in


def create_train_state(cfg: Config, model, feats: FeaturePack, graph, tx,
                       seed: int, extra_init_kwargs: Optional[dict] = None):
    """Initialize params with a dummy batch and build the optimizer state."""
    rng = jax.random.PRNGKey(seed)
    init_rng, drop_rng, base_key = jax.random.split(rng, 3)
    links = jnp.zeros((2, 2), dtype=jnp.int32)
    valid = jnp.ones((2,), dtype=bool)
    kwargs = dict(extra_init_kwargs or {})
    variables = model.init({"params": init_rng, "dropout": drop_rng},
                           links, valid, feats, graph, deterministic=True,
                           **kwargs)
    params = variables["params"]
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), base_key=base_key)


def make_train_step(cfg: Config, model, tx,
                    stats: Optional[FeatureStats]) -> Callable:
    """Returns jitted step(state, links, valid, feats, graph, epoch, **kw)."""
    add_noise = bool(cfg.add_noise) and cfg.model_name != "MSNEA"

    @jax.jit
    def step(state: TrainState, links, valid, feats: FeaturePack, graph,
             epoch, **model_kwargs):
        ekey = jax.random.fold_in(state.base_key, epoch)
        if add_noise:
            nkey, entkey = jax.random.split(jax.random.fold_in(ekey, 7))
            noised = apply_feature_noise(nkey, feats, stats,
                                         cfg.noise_ratio, cfg.mask_ratio)
            entity_noise_key = entkey
        else:
            noised = feats
            entity_noise_key = None
        drop_key = jax.random.fold_in(state.base_key, state.step + 1_000_003)

        def loss_fn(params):
            loss, aux = model.apply(
                {"params": params}, links, valid, noised, graph,
                entity_noise_key=entity_noise_key, deterministic=False,
                rngs={"dropout": drop_key}, **model_kwargs)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, base_key=state.base_key)
        return new_state, loss, aux

    return step


def make_msnea_train_step(cfg: Config, model, tx) -> Callable:
    """MSNEA step: device-side triple sampling + TransE/contrastive losses
    (reference samples on the host each step, MSNEA_tools.py:37-90)."""
    from snag_tpu.models.msnea import sample_triple_batch

    @jax.jit
    def step(state: TrainState, links, valid, feats: FeaturePack, graph,
             epoch, bank):
        skey = jax.random.fold_in(state.base_key, state.step + 31337)
        pos, neg = sample_triple_batch(skey, bank, links.shape[0],
                                       state.step, cfg.neg_triple_num)
        drop_key = jax.random.fold_in(state.base_key, state.step + 1_000_003)

        def loss_fn(params):
            return model.apply({"params": params}, links, valid, feats, graph,
                               pos_triples=pos, neg_triples=neg,
                               deterministic=False,
                               rngs={"dropout": drop_key})

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, base_key=state.base_key)
        return new_state, loss, aux

    return step


def make_embed_fn(cfg: Config, model) -> Callable:
    """Jitted joint-embedding generator for eval/IL (deterministic, no
    noise — reference eval path, main.py:375-379)."""

    @jax.jit
    def embed(params, feats: FeaturePack, graph):
        joint, weight = model.apply({"params": params}, feats, graph,
                                    method=type(model).joint_emb)
        return joint, weight

    return embed
