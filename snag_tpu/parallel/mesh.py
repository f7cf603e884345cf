"""SPMD runtime layer — the framework's replacement for the reference's
dead NCCL helper (SNAG_MMEA/src/distributed_utils.py; never imported by its
main path — SURVEY §2.10).

Scaling model for this workload (entity axis is what grows, not sequence):

* **entity sharding** — feature tables (N, 1000)/(N, d_img), the entity
  embedding, GNN edge aggregation, and the fusion transformer's (N, M, d)
  activations shard over the ``data`` mesh axis;
* **batch sharding** — the B x B contrastive logits shard by rows; XLA
  all-gathers the paired embeddings (local-B x global-B formulation);
* **replicated** — model weights (tiny: a few Dense layers) are replicated;
  gradients arrive via XLA's automatic psum.

All collectives are inserted by GSPMD from sharding annotations — there is
no hand-written communication here.  Multi-host entry is
``jax.distributed.initialize`` + the same mesh spanning all processes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def discover_distributed_env(environ=None):
    """(coordinator_address, num_processes, process_id) from the process
    environment, or (None, None, None) for single-process runs.

    Mirrors the reference's env-var/SLURM rank discovery
    (src/distributed_utils.py:15-21: RANK/WORLD_SIZE, then SLURM_PROCID):
    explicit JAX_* variables win, then torchrun-style RANK/WORLD_SIZE/
    MASTER_ADDR/MASTER_PORT, then SLURM."""
    import os
    env = os.environ if environ is None else environ

    addr = env.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        n = env.get("JAX_NUM_PROCESSES")
        pid = env.get("JAX_PROCESS_ID")
        return (addr, int(n) if n else None, int(pid) if pid else None)

    if "RANK" in env and "WORLD_SIZE" in env:
        host = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "12355")
        return (f"{host}:{port}", int(env["WORLD_SIZE"]), int(env["RANK"]))

    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", ""))
        head = nodelist.split(",")[0].split("[")[0] if nodelist else "127.0.0.1"
        port = env.get("MASTER_PORT", "12355")
        return (f"{head}:{port}", int(env["SLURM_NTASKS"]),
                int(env["SLURM_PROCID"]))

    return (None, None, None)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry (replaces distributed_utils.init_distributed_mode,
    reference src/distributed_utils.py:14-35): jax.distributed over DCN;
    env-var discovery (JAX_* / torchrun RANK / SLURM) when args omitted."""
    if coordinator_address is None:
        coordinator_address, env_n, env_pid = discover_distributed_env()
        num_processes = num_processes if num_processes is not None else env_n
        process_id = process_id if process_id is not None else env_pid
    if coordinator_address is None:
        return  # single process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    """Host-0 gating (replaces distributed_utils.is_main_process)."""
    return jax.process_index() == 0


def parse_mesh_shape(spec: str) -> int:
    """``--mesh_shape`` parser: "data:8" or "8" -> 8 devices on the data
    axis.  Empty/zero means single-device (no mesh)."""
    spec = (spec or "").strip()
    if not spec:
        return 0
    if ":" in spec:
        axis, _, n = spec.partition(":")
        if axis != DATA_AXIS:
            raise ValueError(f"unknown mesh axis {axis!r}; this workload "
                             f"shards over {DATA_AXIS!r} only (SURVEY §2.10)")
        spec = n
    return int(spec)


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place ``x`` (or a pytree) with ``sharding``, multi-process safe.

    Single-process this is ``jax.device_put``.  When the mesh spans
    several processes (jax.distributed multi-host), ``device_put`` cannot
    target non-addressable devices; every process instead holds the SAME
    host value (the multi-host contract for this workload: identical data
    load + identical seeds) and materializes only its addressable shards
    via ``make_array_from_callback``."""
    if x is None:
        return None
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)

    def put_leaf(leaf):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree_util.tree_map(put_leaf, x)


def entity_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (the entity or edge axis) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_kg_arrays(mesh: Mesh, feats, graph):
    """Place feature tables and edge arrays with entity/edge-axis sharding.

    Shapes must divide the mesh (build_graph pads edges; entity counts are
    padded by callers when they want exact division — GSPMD also accepts
    uneven shardings at a small cost).
    """
    def put(x, ndim_hint=None):
        if x is None:
            return None
        nd = x.ndim if ndim_hint is None else ndim_hint
        return put_global(x, entity_sharding(mesh, nd))

    import dataclasses as _dc
    feats = type(feats)(*[put(f) for f in feats])
    graph = _dc.replace(graph, row=put(graph.row), col=put(graph.col),
                        w=put(graph.w), mask=put(graph.mask))
    return feats, graph


def make_sharded_train_step(step_fn, mesh: Mesh, n_extra: int = 0):
    """Wrap a jitted step so batches are row-sharded over the mesh.

    ``step_fn`` comes from train/step.py; we re-jit with explicit input
    shardings for the batch operands and let GSPMD propagate everything
    else from the placement of params/features.  ``n_extra`` covers the
    trailing model-specific operands (MSNEA's triple bank, MEAformer's
    replay buffer) which keep their own placement.  The state arg is
    donated at this outer level (nested-jit donation does not propagate)."""
    in_shardings = (
        None,                      # state: keep current placement
        batch_sharding(mesh, 2),   # links
        batch_sharding(mesh, 1),   # valid
        None, None, None,          # feats, graph, epoch
    ) + (None,) * n_extra
    return jax.jit(step_fn, in_shardings=in_shardings, donate_argnums=(0,))
