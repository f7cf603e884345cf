"""MKGC trainer: jitted margin-ranking steps + filtered full-entity eval.

Training loop contract from SNAG_MKGC/readme.md: NUM_BATCH batches per
epoch over shuffled train triples, NEG_NUM uniform corruptions per positive
(head xor tail), Adam with two LR groups (LR for the embedding/KGE params,
LRG for the fusion/projection stack), Gaussian noise-masking of the
visual/textual tables at epoch or step cadence, early stopping on valid
MRR, final filtered MRR/Hits@{1,3,10} on test.
"""

from __future__ import annotations

import re
import time
from functools import partial
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from snag_tpu.mkgc.config import MKGCConfig
from snag_tpu.mkgc.data import MKGCData
from snag_tpu.mkgc.model import MKGCFeatures, MKGCModel, avg_pool_features
from snag_tpu.ops import noise as noise_ops


@flax.struct.dataclass
class MKGCState:
    params: any
    opt_state: any
    step: jnp.ndarray
    base_key: jax.Array


def prepare_mkgc_features(cfg: MKGCConfig, data: MKGCData) -> MKGCFeatures:
    vis, txt = data.visual, data.textual
    if cfg.use_pool:
        vis = avg_pool_features(vis, cfg.pool_dim)
        txt = avg_pool_features(txt, cfg.pool_dim)
    return MKGCFeatures(visual=jnp.asarray(vis), textual=jnp.asarray(txt))


# the exact top-level module scopes of MKGCModel that form the
# fusion/projection stack (model.py setup()); matching on these instead of
# path substrings means a future param whose name merely CONTAINS "proj"
# or "gate" cannot silently change optimizer group
_FUSION_SCOPES = frozenset(
    ["vis_proj", "txt_proj", "vis_proj2", "txt_proj2", "gate",
     "modal_weight"])
_FUSION_SCOPE_RE = re.compile(r"fusion_\d+")


def _fusion_label_tree(params):
    """Two optimizer groups: fusion/projection stack -> LRG, rest -> LR
    (readme.md LR vs LRG).  Grouping is by the param's TOP-LEVEL module
    scope, matched exactly against MKGCModel's setup() names."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        top = str(getattr(path[0], "key", path[0]))
        if top in _FUSION_SCOPES or _FUSION_SCOPE_RE.fullmatch(top):
            return "fusion"
        return "main"

    labels = [label(p) for p, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), labels)


def build_mkgc_optimizer(cfg: MKGCConfig, params):
    tx = optax.multi_transform(
        {"main": optax.adam(cfg.lr), "fusion": optax.adam(cfg.lrg)},
        _fusion_label_tree(params))
    return tx


def make_mkgc_noise_fn(cfg: MKGCConfig, stats_vis, stats_txt):
    """Per-epoch noisy tables (noise_update=epoch) computed once per epoch."""

    @jax.jit
    def noise_fn(base_key, feats: MKGCFeatures, epoch):
        kv, kt = jax.random.split(
            jax.random.fold_in(jax.random.fold_in(base_key, epoch), 11))
        return MKGCFeatures(
            visual=noise_ops.noise_mask_table(
                kv, feats.visual, stats_vis, cfg.noise_ratio, cfg.mask_ratio),
            textual=noise_ops.noise_mask_table(
                kt, feats.textual, stats_txt, cfg.noise_ratio, cfg.mask_ratio))

    return noise_fn


def make_mkgc_train_step(cfg: MKGCConfig, model: MKGCModel, tx,
                         stats_vis: noise_ops.TableStats,
                         stats_txt: noise_ops.TableStats):
    # epoch-cadence noise is applied outside the step (make_mkgc_noise_fn);
    # step-cadence noise regenerates per step here (readme.md noise_level)
    per_step_noise = bool(cfg.add_noise) and cfg.noise_update == "step"

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: MKGCState, pos, feats: MKGCFeatures, epoch):
        if per_step_noise:
            nkey_base = jax.random.fold_in(state.base_key, state.step)
            kv, kt = jax.random.split(jax.random.fold_in(nkey_base, 11))
            feats = MKGCFeatures(
                visual=noise_ops.noise_mask_table(
                    kv, feats.visual, stats_vis, cfg.noise_ratio, cfg.mask_ratio),
                textual=noise_ops.noise_mask_table(
                    kt, feats.textual, stats_txt, cfg.noise_ratio, cfg.mask_ratio))

        skey = jax.random.fold_in(state.base_key, state.step + 77777)
        b = pos.shape[0]
        k1, k2 = jax.random.split(skey)
        corrupt_head = jax.random.bernoulli(k1, 0.5, (b, cfg.neg_num))
        rand_ent = jax.random.randint(k2, (b, cfg.neg_num), 0, model.ent_num)

        drop_key = jax.random.fold_in(state.base_key, state.step + 13)

        def loss_fn(params):
            return model.apply({"params": params}, pos, rand_ent, corrupt_head,
                               feats, deterministic=False,
                               rngs={"dropout": drop_key})

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return MKGCState(params=new_params, opt_state=new_opt,
                         step=state.step + 1,
                         base_key=state.base_key), loss, aux

    return step


def make_mkgc_epoch_fn(cfg: MKGCConfig, model: MKGCModel, tx,
                       stats_vis: noise_ops.TableStats,
                       stats_txt: noise_ops.TableStats,
                       pos_sharding=None):
    """Whole-epoch training as ONE device program.

    The reference iterates NUM_BATCH host-side batches per epoch; on TPU
    through a remote tunnel each dispatch + 17 KB batch upload costs more
    than the step's compute (profiled: ~13.6 ms/step for ~1 ms of math at
    DB15K geometry).  Uploading the epoch's shuffled triples once as
    (S, B, 3) and ``lax.scan``-ning the step over the leading axis turns 64+
    dispatches into one."""
    step = make_mkgc_train_step(cfg, model, tx, stats_vis, stats_txt)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def epoch_fn(state: MKGCState, triples, feats: MKGCFeatures, epoch,
                 batch: int):
        # device-side epoch shuffle (reference: OpenKE-style host shuffle;
        # metric-level parity, uniform either way) — the triple table stays
        # resident, nothing is uploaded per epoch
        n = triples.shape[0]
        perm = jax.random.permutation(
            jax.random.fold_in(jax.random.fold_in(state.base_key, 424243),
                               epoch), n)
        shuffled = triples[perm][:(n // batch) * batch].reshape(
            n // batch, batch, 3)
        if pos_sharding is not None:
            shuffled = jax.lax.with_sharding_constraint(shuffled, pos_sharding)

        def body(st, pos):
            st, loss, _ = step(st, pos, feats, epoch)
            return st, loss
        state, losses = jax.lax.scan(body, state, shuffled)
        return state, losses.mean()

    return epoch_fn


def make_score_fn(model: MKGCModel, mesh=None):
    """Jitted filtered-rank evaluator, fully device-side, ONE dispatch.

    With ``mesh``, the chunk axis is sharded over the mesh's data axis via
    shard_map — filtered ranking is embarrassingly parallel over triples,
    so each device scans its own chunk slice against locally-computed
    (replicated) entity embeddings; no collectives.

    Distances use the norms+matmul identity (transient is the (C, E) distance
    matrix, never the (C, E, d) broadcast difference), and the known-true
    filter (reference protocol: set filtered candidate scores to +inf before
    ranking) is applied as a gather + strict-count subtraction on padded
    per-triple filter-id arrays — no per-triple host loop.  Both directions'
    chunks run inside a single jit as ``lax.scan``s over resident chunked
    triple/filter tables: the previous per-chunk python loop cost one tunnel
    round-trip per 256 triples (~500 ms per eval at DB15K scale); this is
    one round-trip total.
    """

    def _ranks(q, cand, gold, filt, filt_mask):
        # squared L2 is rank-equivalent to L2 (monotone); clamp for safety
        d2 = jnp.maximum(
            jnp.sum(q ** 2, axis=1)[:, None]
            + jnp.sum(cand ** 2, axis=1)[None, :]
            - 2.0 * (q @ cand.T), 0.0)                         # (C, E)
        rows = jnp.arange(q.shape[0])
        gold_d = d2[rows, gold]                                 # (C,)
        smaller_all = (d2 < gold_d[:, None]).sum(axis=1)
        filt_d = jnp.take_along_axis(d2, filt, axis=1)          # (C, F)
        smaller_filt = ((filt_d < gold_d[:, None]) & filt_mask).sum(axis=1)
        return smaller_all - smaller_filt + 1

    def _scan_dir(rel_emb, jh, jt, trip_c, filt_c, mask_c, head: bool):
        def body(_, args):
            trip, filt, msk = args
            r = rel_emb[trip[:, 1]]
            if head:
                rk = _ranks(jt[trip[:, 2]] - r, jh, trip[:, 0], filt, msk)
            else:
                rk = _ranks(jh[trip[:, 0]] + r, jt, trip[:, 2], filt, msk)
            return 0, rk
        _, rks = jax.lax.scan(body, 0, (trip_c, filt_c, mask_c))
        return rks.reshape(-1)

    @jax.jit
    def eval_ranks(params, feats, t_trip, t_filt, t_mask,
                   h_trip, h_filt, h_mask):
        jh = model.apply({"params": params}, feats, role=0,
                         method=MKGCModel.all_joint)
        jt = model.apply({"params": params}, feats, role=1,
                         method=MKGCModel.all_joint)
        rel = params["rel_emb"]
        if mesh is None:
            rt = _scan_dir(rel, jh, jt, t_trip, t_filt, t_mask, head=False)
            rh = _scan_dir(rel, jh, jt, h_trip, h_filt, h_mask, head=True)
            return rt, rh

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        n_dev = mesh.devices.size

        def padc(x):
            pad = (-x.shape[0]) % n_dev
            if pad:
                # repeated chunks rank pad triples; sliced off by callers
                x = jnp.concatenate(
                    [x, jnp.tile(x[:1], (pad,) + (1,) * (x.ndim - 1))])
            return x

        def body(rel, jh, jt, tt, tf, tm, ht, hf, hm):
            rt = _scan_dir(rel, jh, jt, tt, tf, tm, head=False)
            rh = _scan_dir(rel, jh, jt, ht, hf, hm, head=True)
            return rt, rh

        rep = P(None, None)
        shd = P(axis, None, None)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(rep, rep, rep, shd, shd, shd,
                                 shd, shd, shd),
                       out_specs=(P(axis), P(axis)))
        return fn(rel, jh, jt, padc(t_trip), padc(t_filt), padc(t_mask),
                  padc(h_trip), padc(h_filt), padc(h_mask))

    return eval_ranks


def _padded_filters(data: MKGCData, triples: np.ndarray, direction: str):
    """(T, Fmax) known-true candidate ids + bool mask; padding repeats the
    gold id (strictly-smaller-than-itself is always False, so inert)."""
    lists = []
    for h, r, t in triples:
        if direction == "tail":
            l = data.hr_to_t.get((int(h), int(r)), [])
        else:
            l = data.rt_to_h.get((int(r), int(t)), [])
        # dedupe: the strict-count subtraction must count each filtered
        # candidate once (duplicate triples in the source would double-count)
        lists.append(sorted(set(l)))
    fmax = max(1, max(len(l) for l in lists) if lists else 1)
    gold = triples[:, 2] if direction == "tail" else triples[:, 0]
    filt = np.tile(gold[:, None], (1, fmax)).astype(np.int32)
    mask = np.zeros((len(triples), fmax), dtype=bool)
    for i, l in enumerate(lists):
        if l:
            filt[i, :len(l)] = l
            mask[i, :len(l)] = True
    return filt, mask


def _to_chunks(arr: np.ndarray, chunk: int) -> np.ndarray:
    """(T, ...) -> (S, chunk, ...), last row repeated into the padding."""
    n = len(arr)
    s = -(-n // chunk)
    pad = s * chunk - n
    if pad:
        arr = np.concatenate([arr, np.tile(arr[-1:], (pad,) + (1,) *
                                           (arr.ndim - 1))])
    return arr.reshape((s, chunk) + arr.shape[1:])


def filtered_ranks(cfg: MKGCConfig, model, params, feats, data: MKGCData,
                   triples: np.ndarray, chunk: int = 256, score_fns=None,
                   filter_cache: dict = None):
    """Filtered link-prediction ranks for both directions, one dispatch.

    Returns ranks ordered [tail..., head...].  ``filter_cache``: optional
    dict holding the device-resident chunked triple/filter arrays — they
    depend only on (data, triples), so callers evaluating the same split
    repeatedly (early-stopping cadence) should pass a per-split dict to
    skip the host-side filter construction (~2|T| python iterations per
    eval otherwise)."""
    eval_ranks = score_fns if score_fns is not None else make_score_fn(model)
    n = len(triples)
    if filter_cache is not None and "packs" in filter_cache:
        packs = filter_cache["packs"]
    else:
        packs = []
        for direction in ("tail", "head"):
            filt, mask = _padded_filters(data, triples, direction)
            packs += [jnp.asarray(_to_chunks(triples.astype(np.int32), chunk)),
                      jnp.asarray(_to_chunks(filt, chunk)),
                      jnp.asarray(_to_chunks(mask, chunk))]
        packs = tuple(packs)
        if filter_cache is not None:
            filter_cache["packs"] = packs
    rt, rh = eval_ranks(params, feats, *packs)
    return np.concatenate([np.asarray(rt)[:n], np.asarray(rh)[:n]])


def summarize_lp(ranks: np.ndarray):
    return {
        "mrr": float((1.0 / ranks).mean()),
        "hits1": float((ranks <= 1).mean()),
        "hits3": float((ranks <= 3).mean()),
        "hits10": float((ranks <= 10).mean()),
        "mr": float(ranks.mean()),
    }


class MKGCRunner:
    def __init__(self, cfg: MKGCConfig, logger, data: Optional[MKGCData] = None):
        from snag_tpu.mkgc.data import load_mkgc_data
        self.cfg = cfg
        self.logger = logger
        self.data = data if data is not None else load_mkgc_data(cfg, logger)
        self.feats = prepare_mkgc_features(cfg, self.data)

        # SPMD: --mesh_shape data:N shards the feature tables over the
        # entity axis and every batch over its row axis (SURVEY §2.10)
        self.mesh = None
        self._pos_sharding = None
        if cfg.mesh_shape:
            from snag_tpu.parallel import mesh as mesh_mod
            n_dev = mesh_mod.parse_mesh_shape(cfg.mesh_shape)
            if n_dev:
                self.mesh = mesh_mod.make_mesh(n_dev)
                ent2 = mesh_mod.entity_sharding(self.mesh, 2)
                self.feats = MKGCFeatures(
                    visual=mesh_mod.put_global(self.feats.visual, ent2),
                    textual=mesh_mod.put_global(self.feats.textual, ent2))
                self._pos_sharding = mesh_mod.batch_sharding(self.mesh, 2)
                logger.info(f"SPMD mesh: {n_dev} devices on "
                            f"'{mesh_mod.DATA_AXIS}'")

        self.model = MKGCModel(cfg=cfg, ent_num=self.data.ent_num,
                               rel_num=self.data.rel_num,
                               vis_dim=int(self.feats.visual.shape[1]),
                               txt_dim=int(self.feats.textual.shape[1]))
        rng = jax.random.PRNGKey(cfg.random_seed)
        init_rng, drop_rng, base_key = jax.random.split(rng, 3)
        dummy = jnp.zeros((2, 3), jnp.int32)
        dneg = jnp.zeros((2, cfg.neg_num), jnp.int32)
        dmask = jnp.zeros((2, cfg.neg_num), bool)
        variables = self.model.init({"params": init_rng, "dropout": drop_rng},
                                    dummy, dneg, dmask, self.feats,
                                    deterministic=True)
        params = variables["params"]
        self.tx = build_mkgc_optimizer(cfg, params)
        self.state = MKGCState(params=params, opt_state=self.tx.init(params),
                               step=jnp.zeros((), jnp.int32), base_key=base_key)

        w_vis = np.setdiff1d(np.arange(self.data.ent_num),
                             np.asarray(self.data.ent_wo_visual, dtype=np.int64))
        stats_vis = noise_ops.table_stats(self.feats.visual,
                                          jnp.asarray(w_vis.astype(np.int32)))
        stats_txt = noise_ops.table_stats(self.feats.textual)
        self.train_step = make_mkgc_train_step(cfg, self.model, self.tx,
                                               stats_vis, stats_txt)
        self.epoch_fn = make_mkgc_epoch_fn(cfg, self.model, self.tx,
                                           stats_vis, stats_txt)
        if self.mesh is not None:
            from snag_tpu.parallel.mesh import put_global, replicated
            rep = replicated(self.mesh)
            self.state = MKGCState(
                params=put_global(self.state.params, rep),
                opt_state=put_global(self.state.opt_state, rep),
                step=self.state.step, base_key=self.state.base_key)
            # re-jit with explicit batch sharding; state donated at this
            # outer level (step signature: state, pos, feats, epoch)
            self.train_step = jax.jit(
                self.train_step,
                in_shardings=(None, self._pos_sharding, None, None),
                donate_argnums=(0,))
            from jax.sharding import NamedSharding, PartitionSpec as P
            from snag_tpu.parallel.mesh import DATA_AXIS
            epoch_sh = NamedSharding(self.mesh, P(None, DATA_AXIS, None))
            self.epoch_fn = make_mkgc_epoch_fn(cfg, self.model, self.tx,
                                               stats_vis, stats_txt,
                                               pos_sharding=epoch_sh)
        self._noise_fn = None
        if cfg.add_noise and cfg.noise_update != "step":
            self._noise_fn = make_mkgc_noise_fn(cfg, stats_vis, stats_txt)

        self.batch_size = max(1, len(self.data.train) // cfg.num_batch)
        if self.mesh is not None:
            # batch rows shard over the mesh; round down to a divisible size
            n_dev = self.mesh.devices.size
            self.batch_size = max(n_dev, (self.batch_size // n_dev) * n_dev)
            logger.info(f"mesh batch_size: {self.batch_size}")
        self._score_fns = make_score_fn(self.model, mesh=self.mesh)
        self._train_dev = None      # resident device triple table
        self._filter_caches = {}    # per-split padded filter arrays
        self.best_mrr = 0.0
        self.best_params = None
        self.bad_evals = 0
        self.epoch = 0
        self.start_epoch = 0
        if cfg.resume_from:
            from snag_tpu.utils.checkpoint import load_mkgc_checkpoint
            load_mkgc_checkpoint(self, cfg.resume_from)
            self.start_epoch = self.epoch + 1
            logger.info(f"resumed from {cfg.resume_from} (epoch {self.epoch},"
                        f" best valid MRR {self.best_mrr:.4f})")

    def train_epoch(self, epoch: int) -> float:
        b = self.batch_size
        n_full = (len(self.data.train) // b) * b
        if self._train_dev is None:
            self._train_dev = jnp.asarray(self.data.train.astype(np.int32))
        feats_epoch = self.feats
        if self._noise_fn is not None:
            feats_epoch = self._noise_fn(self.state.base_key, self.feats,
                                         jnp.asarray(epoch))
        if n_full == 0:
            return 0.0
        # whole epoch in one device program: the resident triple table is
        # shuffled ON DEVICE and lax.scan runs every batch
        # (see make_mkgc_epoch_fn) — nothing is uploaded per epoch
        self.state, mean_loss = self.epoch_fn(self.state, self._train_dev,
                                              feats_epoch, jnp.asarray(epoch),
                                              b)
        # one host sync per epoch (device readbacks are expensive through
        # the remote tunnel)
        return float(mean_loss)

    def evaluate(self, split: str = "valid"):
        triples = getattr(self.data, split)
        if split == "valid" and len(triples) > self.cfg.valid_max:
            if not getattr(self, "_valid_cap_logged", False):  # once per run
                self.logger.info(
                    f"valid split capped for early-stopping: using first "
                    f"{self.cfg.valid_max} of {len(triples)} triples "
                    f"({len(triples) - self.cfg.valid_max} dropped; raise "
                    f"--valid_max to use all)")
                self._valid_cap_logged = True
            triples = triples[:self.cfg.valid_max]
        cache = self._filter_caches.setdefault(split, {})
        ranks = filtered_ranks(self.cfg, self.model, self.state.params,
                               self.feats, self.data, triples,
                               score_fns=self._score_fns, filter_cache=cache)
        return summarize_lp(ranks)

    def _checkpoint_path(self) -> str:
        import os.path as osp
        d = self.cfg.checkpoint_dir or osp.join(
            self.cfg.data_path, self.cfg.data_choice, "ckpt")
        return osp.join(d, f"{self.cfg.exp_id}.msgpack")

    def save_model(self, name: str = "") -> str:
        """Best-params snapshot under <data_path>/<data_choice>/save/
        (the MMEA layout, main.py:481-500)."""
        import os
        import os.path as osp
        import flax.serialization
        name = name or self.cfg.exp_id
        d = osp.join(self.cfg.data_path, self.cfg.data_choice, "save")
        os.makedirs(d, exist_ok=True)
        path = osp.join(d, f"{name}.msgpack")
        params = (self.best_params if self.best_params is not None
                  else self.state.params)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(params))
        self.logger.info(f"saving [{path}] done!")
        return path

    def load_model(self, path: str):
        """Load a params-only snapshot written by save_model (the
        counterpart loader; full train-state resumes go through
        utils.checkpoint.load_mkgc_checkpoint)."""
        import flax.serialization
        with open(path, "rb") as f:
            params = flax.serialization.from_bytes(self.state.params, f.read())
        self.state = MKGCState(params=params, opt_state=self.state.opt_state,
                               step=self.state.step,
                               base_key=self.state.base_key)
        self.best_params = params
        self.logger.info(f"loaded params from [{path}]")

    def run(self):
        cfg = self.cfg
        t0 = time.time()
        if cfg.only_test and not cfg.resume_from:
            # without loaded params --only_test would silently evaluate a
            # randomly-initialized model; auto-load the save_model snapshot
            # for this exp_id, or fail loudly
            import os.path as osp
            path = osp.join(cfg.data_path, cfg.data_choice, "save",
                            f"{cfg.exp_id}.msgpack")
            if osp.exists(path):
                self.load_model(path)
            else:
                raise RuntimeError(
                    f"--only_test 1 needs trained params: pass --resume_from "
                    f"or train with --save_model first (looked for {path})")
        if not cfg.only_test:
            for epoch in range(self.start_epoch, cfg.epoch):
                self.epoch = epoch
                loss = self.train_epoch(epoch)
                if (epoch + 1) % cfg.log_every == 0 or epoch == 0:
                    self.logger.info(f"MKGC Ep {epoch}: loss {loss:.4f} "
                                     f"({time.time() - t0:.1f}s)")
                stop = False
                if (epoch + 1) % cfg.eval_epoch == 0:
                    m = self.evaluate("valid")
                    self.logger.info(f"MKGC Ep {epoch} valid: {m}")
                    if m["mrr"] > self.best_mrr:
                        self.best_mrr = m["mrr"]
                        self.best_params = jax.tree_util.tree_map(
                            lambda x: x.copy(), self.state.params)
                        self.bad_evals = 0
                    else:
                        self.bad_evals += 1
                        if self.bad_evals >= cfg.early_stop_patience:
                            self.logger.info(f"early stop at epoch {epoch}")
                            stop = True
                if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                    from snag_tpu.utils.checkpoint import save_mkgc_checkpoint
                    path = save_mkgc_checkpoint(self, self._checkpoint_path())
                    self.logger.info(f"checkpoint saved to {path}")
                if stop:
                    break
        params = (self.best_params if self.best_params is not None
                  else self.state.params)
        self.state = MKGCState(params=params, opt_state=self.state.opt_state,
                               step=self.state.step,
                               base_key=self.state.base_key)
        m = self.evaluate("test")
        self.logger.info(f"MKGC test: {m}")
        if cfg.save_model and not cfg.only_test:
            self.save_model()
        return m
