"""Training orchestrator.

Ports the reference Runner's control flow (SNAG_MMEA/main.py:31-529):
two-stage schedule with the il_start transition (LR/5, 3x horizon, reload
best weights, mid-run test — main.py:158-175), pseudo-label mining every
``semi_learn_step`` epochs and promotion every ``semi_learn_step*10``
(:178-183), eval every ``eval_epoch`` with best-by-MRR-l2r tracking and a
200-eval early-stop counter (:148-149, 197-199, 447-455), and a final test
from the best weights with the top-3 CSV dump (:203-206, 395-420).

Device-side state: params/optimizer (TrainState), IL pools (ILState).
Host-side state: the growing train_ill numpy array (batch construction is
host work; batches are fed capacity-padded so one compiled step serves the
whole run).
"""

from __future__ import annotations

import csv
import os
import os.path as osp
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from snag_tpu.config import Config
from snag_tpu.data.dataset import KGData, load_data
from snag_tpu.eval.ranking import full_rank_eval
from snag_tpu.models import build_model
from snag_tpu.models.encoder import prepare_features, prepare_stats
from snag_tpu.ops.fusion import l2norm
from snag_tpu.train import il as il_mod
from snag_tpu.train.optim import build_optimizer
from snag_tpu.train.step import (TrainState, create_train_state,
                                 make_embed_fn, make_msnea_train_step,
                                 make_train_step)
from snag_tpu.utils import LossLog, set_seed


@jax.jit
def _normalized(emb):
    return l2norm(emb)


def _tree_copy(tree):
    return jax.tree_util.tree_map(lambda x: x.copy(), tree)


class Runner:
    def __init__(self, cfg: Config, logger, data: Optional[KGData] = None):
        self.cfg = cfg
        self.logger = logger
        set_seed(cfg.random_seed)

        self.data = data if data is not None else load_data(cfg, logger)
        self.train_ill = np.asarray(self.data.train_ill, dtype=np.int32)
        self.test_left = jnp.asarray(self.data.test_ill[:, 0].astype(np.int64))
        self.test_right = jnp.asarray(self.data.test_ill[:, 1].astype(np.int64))

        self.feats = prepare_features(cfg, self.data)
        self.stats = (prepare_stats(self.feats, self.data.ent_w_img)
                      if cfg.add_noise else None)
        self.graph = self.data.graph
        self.model = build_model(cfg, self.data)

        # SPMD: --mesh_shape data:N shards the entity/edge axes of the KG
        # arrays and the batch axis of every step over an N-device mesh
        # (§2.10 items 1-4; replaces the reference's dead NCCL helper)
        self.mesh = None
        self._batch_shardings = None
        if cfg.mesh_shape:
            from snag_tpu.parallel import mesh as mesh_mod
            n_dev = mesh_mod.parse_mesh_shape(cfg.mesh_shape)
            if n_dev:
                if n_dev > len(jax.devices()):
                    raise ValueError(
                        f"--mesh_shape wants {n_dev} devices, have "
                        f"{len(jax.devices())}")
                self.mesh = mesh_mod.make_mesh(n_dev)
                self.feats, self.graph = mesh_mod.shard_kg_arrays(
                    self.mesh, self.feats, self.graph)
                self._batch_shardings = (
                    mesh_mod.batch_sharding(self.mesh, 2),
                    mesh_mod.batch_sharding(self.mesh, 1))
                if cfg.batch_size % n_dev:
                    # batches are capacity-padded with a validity mask, so
                    # rounding the capacity up is loss-exact
                    import dataclasses as _dc
                    new_b = -(-cfg.batch_size // n_dev) * n_dev
                    cfg = _dc.replace(cfg, batch_size=new_b)
                    self.cfg = cfg
                    self.logger.info(f"mesh batch capacity: {new_b}")
                self.logger.info(
                    f"SPMD mesh: {n_dev} devices on '{mesh_mod.DATA_AXIS}'")

        self.bank = None
        extra_init = None
        if cfg.model_name == "MSNEA":
            from snag_tpu.models.msnea import TripleBank
            self.bank = TripleBank.from_data(self.data)
            z = jnp.zeros((2,), jnp.int32)
            extra_init = {"pos_triples": (z, z, z), "neg_triples": (z, z, z)}
        self._extra_init = extra_init

        # stage-0 optimizer horizon (main.py:51-56)
        if cfg.il:
            assert cfg.il_start < cfg.epoch
            stage_epochs = cfg.il_start
        else:
            stage_epochs = cfg.epoch
        self._lr = cfg.lr
        self._build_optimizer(stage_epochs, init_state=True)
        self.embed_fn = make_embed_fn(cfg, self.model)

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.state.params))
        self.logger.info(f"total params num: {n_params}")

        # run-state
        self.loss_log = LossLog()
        self.best_params = None
        self.best_mrr = 0.0
        self.early_stop_init = 200
        self.early_stop_count = self.early_stop_init
        self.stage = 0
        self.epoch = 0
        self.il_state = (il_mod.ILState.init(self.data.left_non_train,
                                             self.data.right_non_train)
                         if cfg.il else None)
        self.history = []
        self._last_aux = {}

        # replay buffer (MEAformer --replay): last mined hardest negative per
        # entity, -1 = none yet; replay starts when the buffer stops growing
        # (MEAformer.py:55-61, 138-148)
        self.replay_neg = None
        self.replay_ready = False
        self._last_neg_count = None
        if cfg.model_name == "MEAformer" and cfg.replay:
            self.replay_neg = -jnp.ones((self.data.ent_num,), jnp.int32)

        # observability: JSONL (+tensorboard if available) scalar sink
        self.writer = None
        if not cfg.no_tensorboard:
            try:
                from snag_tpu.utils.logging import get_dump_path
                from snag_tpu.utils.metrics_writer import MetricsWriter
                self.writer = MetricsWriter(get_dump_path(cfg))
            except Exception as e:  # never let observability kill training
                self.logger.info(f"metrics writer disabled: {e}")

        self.start_epoch = 0
        if cfg.resume_from:
            from snag_tpu.utils.checkpoint import load_checkpoint
            load_checkpoint(self, cfg.resume_from)
            if self.stage == 1:
                # rebuild the stage-1 optimizer horizon, then restore its
                # state again (structure is identical, schedule differs)
                self._build_optimizer((cfg.epoch - cfg.il_start) * 3,
                                      init_state=False)
                load_checkpoint(self, cfg.resume_from)
            self.start_epoch = self.epoch + 1
            self.logger.info(f"resumed from {cfg.resume_from} "
                             f"(epoch {self.epoch}, stage {self.stage})")

    # ------------------------------------------------------------------
    def _steps_per_epoch(self) -> int:
        b = self.cfg.batch_size
        return max(1, -(-len(self.train_ill) // b))

    def _build_optimizer(self, total_epochs: int, init_state: bool):
        cfg = self.cfg
        total_steps = self._steps_per_epoch() * total_epochs
        warmup = int(total_steps * 0.15)
        self.logger.info(f"total_steps: {total_steps}  warmup_steps: {warmup}  "
                         f"lr: {self._lr}  weight_decay: {cfg.weight_decay}")
        if init_state:
            # need params to label the SNAG groups: init with a throwaway tx
            import optax
            dummy_tx = optax.sgd(1e-3)
            self.state = create_train_state(cfg, self.model, self.feats,
                                            self.graph, dummy_tx,
                                            cfg.random_seed, self._extra_init)
        self.tx, self.lr_sched = build_optimizer(
            cfg, self.state.params, total_steps, warmup, lr=self._lr)
        self.state = TrainState(params=self.state.params,
                                opt_state=self.tx.init(self.state.params),
                                step=jnp.zeros((), jnp.int32),
                                base_key=self.state.base_key)
        if cfg.model_name == "MSNEA":
            self.train_step = make_msnea_train_step(cfg, self.model, self.tx)
        elif cfg.model_name == "MEAformer" and cfg.replay:
            from snag_tpu.train.step import make_meaformer_replay_step
            self.train_step = make_meaformer_replay_step(
                cfg, self.model, self.tx, self.stats)
        else:
            self.train_step = make_train_step(cfg, self.model, self.tx, self.stats)
        self._noise_fn = None
        if cfg.add_noise and cfg.model_name != "MSNEA":
            from snag_tpu.train.step import make_noise_fn
            self._noise_fn = make_noise_fn(cfg, self.stats)

        if self.mesh is not None:
            from snag_tpu.parallel.mesh import (make_sharded_train_step,
                                                put_global, replicated)
            rep = replicated(self.mesh)
            self.state = TrainState(
                params=put_global(self.state.params, rep),
                opt_state=put_global(self.state.opt_state, rep),
                step=self.state.step, base_key=self.state.base_key)
            n_extra = 1 if (cfg.model_name == "MSNEA"
                            or (cfg.model_name == "MEAformer" and cfg.replay)
                            ) else 0
            if cfg.model_name == "MEAformer" and cfg.replay:
                n_extra = 2   # replay buffer + ready flag
            self.train_step = make_sharded_train_step(self.train_step,
                                                      self.mesh, n_extra)

    def _batches(self):
        """Shuffled, capacity-padded batches (DataLoader equivalent)."""
        b = self.cfg.batch_size
        perm = np.random.permutation(len(self.train_ill))
        data = self.train_ill[perm]
        for i in range(0, len(data), b):
            chunk = data[i:i + b]
            n = len(chunk)
            if n < b:
                pad = np.zeros((b - n, 2), dtype=chunk.dtype)
                chunk = np.vstack([chunk, pad])
            valid = np.zeros((b,), dtype=bool)
            valid[:n] = True
            links_d = jnp.asarray(chunk.astype(np.int64))
            valid_d = jnp.asarray(valid)
            if self._batch_shardings is not None:
                from snag_tpu.parallel.mesh import put_global
                links_d = put_global(links_d, self._batch_shardings[0])
                valid_d = put_global(valid_d, self._batch_shardings[1])
            yield links_d, valid_d

    # ------------------------------------------------------------------
    def train_epoch(self) -> float:
        # losses accumulate as device scalars; ONE host sync per epoch (a
        # device->host readback costs ~350 ms through the axon tunnel)
        if len(self.train_ill) == 0:
            raise RuntimeError(
                "train_ill is empty — no training pairs. Check --data_rate "
                "and, with --unsup, whether visual_pivot_induction produced "
                "any seed pairs.")
        losses = []
        aux = None
        feats_epoch = self.feats
        if self._noise_fn is not None:
            # per-epoch noisy tables (update_noise, main.py:253-254)
            feats_epoch, _ = self._noise_fn(self.state.base_key, self.feats,
                                            jnp.asarray(self.epoch))
        for links, valid in self._batches():
            if self.cfg.model_name == "MSNEA":
                self.state, loss, aux = self.train_step(
                    self.state, links, valid, self.feats, self.graph,
                    jnp.asarray(self.epoch), self.bank)
            elif self.replay_neg is not None:
                self.state, loss, aux, self.replay_neg = self.train_step(
                    self.state, links, valid, feats_epoch, self.graph,
                    jnp.asarray(self.epoch), self.replay_neg,
                    jnp.asarray(self.replay_ready))
            else:
                self.state, loss, aux = self.train_step(
                    self.state, links, valid, feats_epoch, self.graph,
                    jnp.asarray(self.epoch))
            losses.append(loss)

        if self.replay_neg is not None and not self.replay_ready:
            n_unset = int((self.replay_neg < 0).sum())
            if self._last_neg_count is not None and n_unset == self._last_neg_count:
                self.replay_ready = True
                self.logger.info("begin replay!")
            self._last_neg_count = n_unset

        # keep last-batch scalar loss terms + mean modality weights for the
        # metrics sink (the reference's tensorboard scalars, main.py:304-328)
        self._last_aux = {}
        for k, v in (aux or {}).items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                self._last_aux[k] = float(arr)
            elif k == "weight_norm":
                names = self.cfg.active_modalities()
                for mi, m in enumerate(names[:arr.shape[0]]):
                    self._last_aux[f"w_{m}"] = float(arr[mi])
        return float(jnp.stack(losses).mean()) if losses else 0.0

    # ------------------------------------------------------------------
    def _joint_emb(self, params=None):
        params = self.state.params if params is None else params
        joint, weight = self.embed_fn(params, self.feats, self.graph)
        return joint, weight

    def _log_weight(self, w):
        if w is None or self.cfg.model_name not in ("EVA", "MCLEA", "SNAG"):
            return
        # learned modality weights (main.py:361-373)
        w = np.asarray(w)
        if w.ndim == 2:      # per-entity attention weights -> mean
            w = w.mean(axis=0)
        names = self.cfg.active_modalities()
        desc = "-".join(f"[{m}_{w[i]:.3f}]" for i, m in
                        enumerate(names[:len(w)]))
        self.logger.info(f"modality weights: {desc}")

    def evaluate(self, last_epoch: bool = False, save_name: str = "",
                 params=None):
        cfg = self.cfg
        from snag_tpu.ops.pallas.rank_eval import rank_eval_ok
        if (not last_epoch and self.mesh is None and cfg.distance == 2
                and rank_eval_ok()):
            # fast path for the eval-every-2-epochs cadence: ONE dispatch,
            # ~100-byte readback (make_eval_metrics_fn)
            if not hasattr(self, "_eval_metrics_fn"):
                from snag_tpu.train.step import make_eval_metrics_fn
                self._eval_metrics_fn = make_eval_metrics_fn(cfg, self.model)
            vec, wmean = self._eval_metrics_fn(
                self.state.params if params is None else params,
                self.feats, self.graph, self.test_left, self.test_right)
            self._log_weight(wmean)
            from snag_tpu.eval.ranking import result_from_metrics_vector
            return self._finish_eval(result_from_metrics_vector(vec),
                                     last_epoch, save_name)

        joint, weight = self._joint_emb(params)
        self._log_weight(weight)
        emb = _normalized(joint)
        if self.mesh is not None and cfg.distance == 2:
            # SPMD eval: query rows sharded over the mesh's data axis,
            # candidate matrix replicated (eval/sharded.py)
            from snag_tpu.eval.ranking import result_from_ranks
            from snag_tpu.eval.sharded import sharded_full_rank_eval
            ranks_l, ranks_r, top3 = sharded_full_rank_eval(
                self.mesh, emb[self.test_left], emb[self.test_right],
                csls_k=cfg.csls_k, use_csls=cfg.csls)
            res = result_from_ranks(ranks_l, ranks_r,
                                    top3 if last_epoch else None)
        else:
            res = full_rank_eval(emb[self.test_left], emb[self.test_right],
                                 top_k=(1, 10, 50), csls_k=cfg.csls_k,
                                 use_csls=cfg.csls, distance_kind=cfg.distance,
                                 with_top3=last_epoch)
        return self._finish_eval(res, last_epoch, save_name)

    def _finish_eval(self, res, last_epoch: bool, save_name: str):
        self.logger.info(
            f"Ep {self.epoch} | l2r: acc of top [1, 10, 50] = {res.acc_l2r}, "
            f"mr = {res.mr_l2r:.3f}, mrr = {res.mrr_l2r:.3f}")
        self.logger.info(
            f"Ep {self.epoch} | r2l: acc of top [1, 10, 50] = {res.acc_r2l}, "
            f"mr = {res.mr_r2l:.3f}, mrr = {res.mrr_r2l:.3f}")
        if last_epoch:
            self._dump_predictions(res, save_name)
            t1, t2, _ = res.acc_l2r
            self.logger.info(f"Res:[{t1}\t{t2}\t{res.mrr_l2r:.3f}]")
        self.history.append({"epoch": self.epoch, "mrr_l2r": res.mrr_l2r,
                             "hits1_l2r": float(res.acc_l2r[0])})

        self.early_stop_count -= 1
        if res.mrr_l2r > self.best_mrr and not last_epoch:
            self.logger.info(
                f"Best model update in Ep {self.epoch}: MRR from "
                f"[{self.best_mrr}] --> [{res.mrr_l2r}] ...")
            self.best_mrr = res.mrr_l2r
            self.early_stop_count = self.early_stop_init
            self.best_params = jax.tree_util.tree_map(lambda x: x.copy(),
                                                      self.state.params)
        return res

    def _dump_predictions(self, res, save_name: str):
        """Top-3 retrieval CSV (main.py:395-420)."""
        cfg = self.cfg
        if res.top3_l2r is None:
            return
        save_name = save_name or cfg.model_name
        path = osp.join(cfg.data_path, cfg.model_name, f"{save_name}_pred")
        os.makedirs(path, exist_ok=True)
        tl = np.asarray(self.test_left)
        tr = np.asarray(self.test_right)
        rows = [["idx", "rank", "query_id", "gt_id", "ret1", "ret2", "ret3"]]
        for i in range(len(tl)):
            r3 = res.top3_l2r[i]
            rows.append([i, int(res.ranks_l2r[i]), tl[i], tr[i],
                         tr[r3[0]], tr[r3[1]], tr[r3[2]]])
        with open(osp.join(path, f"{cfg.data_choice}_pred.txt"), "w") as f:
            csv.writer(f, dialect="excel").writerows(rows)

    # ------------------------------------------------------------------
    def _il_mine(self):
        """il_for_ea (main.py:214-223)."""
        cfg = self.cfg
        joint, _ = self._joint_emb()
        emb = _normalized(joint)
        sls = cfg.semi_learn_step
        fresh = ((self.epoch + 1) % (sls * 5)) == sls
        il = self.il_state
        new_cand = il_mod.mine_new_links(
            emb, il.left_cand, il.left_valid, il.right_cand, il.right_valid,
            il.cand_right, jnp.asarray(fresh), mesh=self.mesh)
        self.il_state = il_mod.ILState(
            left_cand=il.left_cand, left_valid=il.left_valid,
            right_cand=il.right_cand, right_valid=il.right_valid,
            cand_right=new_cand)
        if (self.epoch + 1) % (sls * 5) == 0:
            n = int(np.asarray((new_cand >= 0) & il.left_valid).sum())
            self.logger.info(f"[epoch {self.epoch}] #links in candidate set: {n}")

    def _il_refresh(self):
        """il_for_data_ref (main.py:226-237)."""
        self.il_state, self.train_ill, n_new = il_mod.promote_candidates(
            self.il_state, self.train_ill, self.data.test_ill_set, self.logger)
        if n_new:
            set_seed(self.cfg.random_seed)

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        t0 = time.time()
        profiling = False
        for i in range(self.start_epoch, cfg.epoch):
            self.epoch = i

            if cfg.profile_dir and i == 2 and not profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            if profiling and i == 4:
                jax.profiler.stop_trace()
                profiling = False
                self.logger.info(f"profiler trace written to {cfg.profile_dir}")

            if cfg.il and ((self.epoch == cfg.il_start and self.stage == 0)
                           or (self.early_stop_count <= 0
                               and self.epoch <= cfg.il_start)):
                if self.early_stop_count <= 0:
                    self.logger.info(
                        f"Early stop in epoch {self.epoch}... Begin iteration....")
                self.stage = 1
                self.early_stop_count = self.early_stop_init
                self._lr = self._lr / 5
                self._build_optimizer((cfg.epoch - cfg.il_start) * 3,
                                      init_state=False)
                if self.best_params is not None:
                    self.logger.info("load from the best model before IL... ")
                    # copy: the train step donates state buffers — loading
                    # best_params by reference would let a later step delete
                    # the best-model copy
                    self.state = TrainState(params=_tree_copy(self.best_params),
                                            opt_state=self.state.opt_state,
                                            step=self.state.step,
                                            base_key=self.state.base_key)
                self.evaluate(last_epoch=True,
                              save_name=f"{cfg.exp_id}_test_ep{cfg.epoch}_no_iter")

            if self.stage == 1 and cfg.il and (self.epoch + 1) % cfg.semi_learn_step == 0:
                self._il_mine()
            if (self.stage == 1 and cfg.il
                    and (self.epoch + 1) % (cfg.semi_learn_step * 10) == 0):
                self._il_refresh()

            epoch_loss = self.train_epoch()
            self.loss_log.update(epoch_loss)
            if (i + 1) % cfg.log_every == 0 or i == 0:
                lr_now = float(self.lr_sched(self.state.step))
                self.logger.info(
                    f"Ep [{i}/{cfg.epoch}] Step [{int(self.state.step)}] "
                    f"LR [{lr_now:.6f}] Loss {epoch_loss:.5f} "
                    f"({time.time() - t0:.1f}s)")
                if self.writer is not None:
                    self.writer.scalars("loss", {"train_loss": epoch_loss},
                                        int(self.state.step))
                    self.writer.scalars("lr", {"lr": lr_now},
                                        int(self.state.step))
                    if self._last_aux:
                        self.writer.scalars("loss_terms", self._last_aux,
                                            int(self.state.step))

            if (i + 1) % cfg.eval_epoch == 0:
                self.evaluate()

            if cfg.checkpoint_every and (i + 1) % cfg.checkpoint_every == 0:
                from snag_tpu.utils.checkpoint import save_checkpoint
                from snag_tpu.utils.logging import get_dump_path
                path = osp.join(get_dump_path(cfg), "checkpoint.msgpack")
                save_checkpoint(self, path)
                self.logger.info(f"checkpoint saved to {path}")

            if self.stage == 1 and self.early_stop_count <= 0:
                self.logger.info(f"Early stop in epoch {self.epoch}")
                break

        if self.best_params is not None:
            self.logger.info("load from the best model before final testing ... ")
            self.state = TrainState(params=_tree_copy(self.best_params),
                                    opt_state=self.state.opt_state,
                                    step=self.state.step,
                                    base_key=self.state.base_key)
        self.logger.info(" --------------------- Test result --------------------- ")
        res = self.evaluate(last_epoch=True,
                            save_name=f"{cfg.exp_id}_test_ep{cfg.epoch}")
        self.logger.info(f"min loss {self.loss_log.get_min_loss()}")
        if cfg.save_model:
            self.save_model()
        return res

    # ------------------------------------------------------------------
    def save_model(self, name: str = ""):
        """flax-msgpack checkpoint under <data_path>/<model>/save/
        (main.py:481-500 layout)."""
        cfg = self.cfg
        name = name or cfg.exp_id
        path = osp.join(cfg.data_path, cfg.model_name, "save")
        os.makedirs(path, exist_ok=True)
        path = osp.join(path, f"{name}.msgpack")
        params = self.best_params if self.best_params is not None else self.state.params
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(params))
        self.logger.info(f"saving [{path}] done!")
        return path

    def load_model(self, name: str):
        cfg = self.cfg
        if name.endswith(".pkl"):
            # a reference-framework checkpoint (torch.save(state_dict) —
            # SNAG_MMEA/main.py:481-500): import it into our param tree so
            # reference users can evaluate / warm-start migrated models,
            # e.g. --model_name_save ref_ckpt.pkl [--only_test 1]
            from snag_tpu.utils.import_reference import \
                import_reference_checkpoint
            path = name if osp.isabs(name) else osp.join(
                cfg.data_path, cfg.model_name, "save", name)
            if not osp.exists(path):
                self.logger.info(f"{path} not exist!!")
                return False
            params = import_reference_checkpoint(self.state.params, path)
            self.state = TrainState(params=params,
                                    opt_state=self.state.opt_state,
                                    step=self.state.step,
                                    base_key=self.state.base_key)
            self.logger.info(f"imported reference checkpoint [{path}] done!")
            return True
        path = osp.join(cfg.data_path, cfg.model_name, "save", f"{name}.msgpack")
        if not osp.exists(path):
            self.logger.info(f"{name}.msgpack not exist!!")
            return False
        with open(path, "rb") as f:
            params = flax.serialization.from_bytes(self.state.params, f.read())
        self.state = TrainState(params=params, opt_state=self.state.opt_state,
                                step=self.state.step,
                                base_key=self.state.base_key)
        self.logger.info(f"loading model [{name}.msgpack] done!")
        return True
