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


def make_noise_fn(cfg: Config, stats: Optional[FeatureStats]) -> Callable:
    """Per-epoch noisy feature tables (update_noise cadence, main.py:253-254)
    — computed ONCE per epoch outside the step instead of regenerated every
    step (same epoch-folded key => identical values, ~10 ms/step saved at
    DBP15K scale)."""

    @jax.jit
    def noise_fn(base_key, feats: FeaturePack, epoch):
        ekey = jax.random.fold_in(base_key, epoch)
        nkey, entkey = jax.random.split(jax.random.fold_in(ekey, 7))
        noised = apply_feature_noise(nkey, feats, stats,
                                     cfg.noise_ratio, cfg.mask_ratio)
        return noised, entkey

    return noise_fn


def make_train_step(cfg: Config, model, tx,
                    stats: Optional[FeatureStats]) -> Callable:
    """Returns jitted step(state, links, valid, feats, graph, epoch, **kw).

    ``feats`` are the (already noised, when add_noise) epoch feature tables;
    the entity-embedding noise key still derives inside the step (it depends
    on the live embedding table)."""
    add_noise = bool(cfg.add_noise) and cfg.model_name != "MSNEA"

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, links, valid, feats: FeaturePack, graph,
             epoch, **model_kwargs):
        noised = feats
        if add_noise:
            ekey = jax.random.fold_in(state.base_key, epoch)
            _, entity_noise_key = jax.random.split(jax.random.fold_in(ekey, 7))
        else:
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


def replay_negative_mask(neg: jnp.ndarray, batch_ents: jnp.ndarray,
                         valid: jnp.ndarray) -> jnp.ndarray:
    """Fixed-shape equivalent of the reference's replay-negative filter
    ``list(set(neg) - set(batch_ents))`` (MEAformer.py:118-124): a slot
    survives iff its entity is mined (>= 0, from a valid row), absent from
    the batch, and the first occurrence of that entity (set semantics)."""
    pos = jnp.arange(neg.shape[0])
    in_batch = jnp.any(neg[:, None] == batch_ents[None, :], axis=1)
    # "first occurrence" counts only earlier *valid* slots, so a padded row
    # holding the same entity cannot swallow a real one
    earlier_equal = ((neg[:, None] == neg[None, :]) & valid[None, :]
                     & (pos[None, :] < pos[:, None]))
    return (neg >= 0) & valid & ~in_batch & ~jnp.any(earlier_equal, axis=1)


def make_meaformer_replay_step(cfg: Config, model, tx,
                               stats: Optional[FeatureStats]) -> Callable:
    """MEAformer step with the replay negative strategy (MEAformer.py:102-148).

    ``replay_neg`` is a device (N,) int32 array: the last mined hardest
    negative entity per entity, or -1.  The reference stores raw logit
    column indices and replays them as entity ids; here the mined column is
    mapped to the entity it actually denotes (ab block -> paired entity,
    aa block -> same-side entity).  The reference's
    ``set(neg) - set(batch_ents)`` filter (MEAformer.py:118-124) is
    reproduced exactly on fixed shapes: negatives already present in the
    batch are masked out, and duplicate mined entities keep only their
    first occurrence (a set holds each element once, so a repeated hardest
    negative must contribute one logit column, not several).  Unfilled (-1)
    slots are dropped rather than wrapping to the last entity (reference
    quirk: -1 survives its set-difference and indexes row -1)."""
    add_noise = bool(cfg.add_noise)

    @functools.partial(jax.jit, donate_argnums=(0, 6))
    def step(state: TrainState, links, valid, feats: FeaturePack, graph,
             epoch, replay_neg, replay_ready):
        noised = feats
        if add_noise:
            ekey = jax.random.fold_in(state.base_key, epoch)
            _, entity_noise_key = jax.random.split(jax.random.fold_in(ekey, 7))
        else:
            entity_noise_key = None
        drop_key = jax.random.fold_in(state.base_key, state.step + 1_000_003)

        b = links.shape[0]
        neg_l = replay_neg[links[:, 0]]
        neg_r = replay_neg[links[:, 1]]
        batch_ents = jnp.concatenate([links[:, 0], links[:, 1]])

        use = replay_ready
        neg_l_valid = replay_negative_mask(neg_l, batch_ents, valid) & use
        neg_r_valid = replay_negative_mask(neg_r, batch_ents, valid) & use
        neg_l_safe = jnp.maximum(neg_l, 0)
        neg_r_safe = jnp.maximum(neg_r, 0)

        def loss_fn(params):
            loss, aux = model.apply(
                {"params": params}, links, valid, noised, graph,
                entity_noise_key=entity_noise_key, deterministic=False,
                replay_neg_l=neg_l_safe, replay_neg_r=neg_r_safe,
                replay_neg_valid=neg_l_valid, replay_neg_valid_r=neg_r_valid,
                rngs={"dropout": drop_key})
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # map mined logit columns to entity ids and scatter into the buffer
        # logits_a blocks: [ab: zjs -> links[:,1] | aa: zis -> links[:,0] | replay]
        l_col = aux.pop("l_neg")
        r_col = aux.pop("r_neg")

        def col_to_ent(col, first, second):
            in_ab = col < b
            idx = jnp.where(in_ab, col, jnp.minimum(col - b, b - 1))
            return jnp.where(in_ab, first[idx], second[idx])

        l_ent = col_to_ent(l_col, links[:, 1], links[:, 0])
        r_ent = col_to_ent(r_col, links[:, 0], links[:, 1])
        new_replay = replay_neg.at[links[:, 0]].set(
            jnp.where(valid, l_ent.astype(replay_neg.dtype), neg_l))
        new_replay = new_replay.at[links[:, 1]].set(
            jnp.where(valid, r_ent.astype(replay_neg.dtype), neg_r))

        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, base_key=state.base_key)
        return new_state, loss, aux, new_replay

    return step


def make_msnea_train_step(cfg: Config, model, tx) -> Callable:
    """MSNEA step: device-side triple sampling + TransE/contrastive losses
    (reference samples on the host each step, MSNEA_tools.py:37-90)."""
    from snag_tpu.models.msnea import sample_triple_batch

    @functools.partial(jax.jit, donate_argnums=(0,))
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


def make_eval_metrics_fn(cfg: Config, model) -> Callable:
    """ONE-dispatch evaluation: embed -> normalize -> gather test rows ->
    streaming bidirectional ranks -> Hits/MR/MRR reduction, all inside a
    single jit returning a (10,) metric vector plus the mean modality
    weights.  The only readback is ~100 bytes — through the axon tunnel
    the previous 4-dispatch + two-rank-array-readback eval paid ~50 ms of
    overhead on 27 ms of device time (VERDICT r4 weak #4)."""
    from snag_tpu.eval.ranking import metrics_from_ranks_device
    from snag_tpu.ops.fusion import l2norm
    from snag_tpu.ops.pallas.rank_eval import streaming_rank_eval

    @jax.jit
    def eval_all(params, feats: FeaturePack, graph, test_left, test_right):
        joint, weight = model.apply({"params": params}, feats, graph,
                                    method=type(model).joint_emb)
        emb = l2norm(joint)
        ranks_l, ranks_r, _ = streaming_rank_eval(
            emb[test_left], emb[test_right], cfg.csls_k, bool(cfg.csls),
            False)
        wmean = None
        if weight is not None:
            wmean = weight.mean(axis=0) if weight.ndim == 2 else weight
        return metrics_from_ranks_device(ranks_l, ranks_r), wmean

    return eval_all
