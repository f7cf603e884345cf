"""Experiment harness: logger + dump-dir layout.

Mirrors the torchlight harness contract (reference:
SNAG_MMEA/torchlight/logger.py — elapsed-time log formatter :17-42, exp
initialisation + params dump + command reconstruction :71-109, dump path
layout `dump/<MMDD-exp_name>/<exp_id>/` :111-139).
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import random
import string
import sys
import time
from datetime import datetime, timedelta


class ElapsedFormatter(logging.Formatter):
    """Prefix every record with wall time and time elapsed since start."""

    def __init__(self):
        super().__init__()
        self.start_time = time.time()

    def format(self, record):
        elapsed = timedelta(seconds=round(record.created - self.start_time))
        header = "%s - %s" % (time.strftime("%x %X"), elapsed)
        msg = record.getMessage().replace("\n", "\n" + " " * (len(header) + 3))
        return f"{header} - {msg}"


def create_logger(filepath: str | None = None, name: str = "snag_tpu") -> logging.Logger:
    """Console + optional file logger (torchlight/logger.py:24-58).

    Multi-process runs (jax.distributed) write per-rank files —
    ``<filepath>.rank<k>`` for every process but 0, which keeps the plain
    ``filepath`` (the reference's per-rank suffixing, torchlight/
    logger.py:44-46) — and only rank 0 logs to the console."""
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = ElapsedFormatter()

    rank = 0
    try:
        import jax
        if jax.process_count() > 1:
            rank = jax.process_index()
    except Exception:
        pass

    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    else:
        # workers keep a WARNING+ stderr handler so a crash breadcrumb
        # logged just before a worker dies is never silently dropped
        # (propagate=False + no file path would otherwise mean 0 handlers)
        sh = logging.StreamHandler(sys.stderr)
        sh.setLevel(logging.WARNING)
        sh.setFormatter(fmt)
        logger.addHandler(sh)

    if filepath:
        if rank:
            filepath = f"{filepath}.rank{rank}"
        fh = logging.FileHandler(filepath, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_dump_path(cfg) -> str:
    """`<dump_path>/<MMDD-exp_name>/<exp_id>/` (torchlight/logger.py:111-139)."""
    assert cfg.exp_name, "experiment name must be specified"
    sweep_dir = osp.join(cfg.dump_path, f"{datetime.now().strftime('%m%d')}-{cfg.exp_name}")
    os.makedirs(sweep_dir, exist_ok=True)

    exp_id = cfg.exp_id
    if not exp_id:
        chars = string.ascii_lowercase + string.digits
        while True:
            exp_id = "".join(random.choice(chars) for _ in range(10))
            if not osp.isdir(osp.join(sweep_dir, exp_id)):
                break
    path = osp.join(sweep_dir, exp_id)
    os.makedirs(path, exist_ok=True)
    return path


def initialize_exp(cfg, logger_name: str = "snag_tpu") -> logging.Logger:
    """Create dump dir, dump params JSON, reconstruct the launch command."""
    dump = get_dump_path(cfg)
    with open(osp.join(dump, "params.json"), "w") as f:
        json.dump(
            {k: v for k, v in vars(cfg).items() if not k.startswith("_")},
            f, indent=2, default=str,
        )
    logger = create_logger(osp.join(dump, "train.log"), name=logger_name)
    logger.info("============ Initialized logger ============")
    logger.info("\n".join(f"{k}: {v}" for k, v in sorted(vars(cfg).items())))
    logger.info(f"The experiment will be stored in {dump}\n")
    logger.info("Running command: %s" % " ".join(sys.argv))
    return logger


def get_code_version(short_sha: bool = True):
    """Current git commit sha of the working tree, or None outside a repo
    (torchlight/utils.py:126-137 — unused by the reference's own main path,
    kept for harness API parity)."""
    import subprocess
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.STDOUT,
            cwd=osp.dirname(osp.abspath(__file__)), encoding="utf-8").strip()
        return sha[:7] if short_sha else sha
    except (subprocess.CalledProcessError, OSError):
        return None


def snapshot(params, model_name: str, epoch: int, save_path: str) -> str:
    """Params-only snapshot `<save_path>/<model_name>_<epoch>_epoch.msgpack`
    (torchlight/utils.py:61-74's model-state dump, flax-serialized instead
    of torch.save).  Load with flax.serialization.from_bytes(template, ...)."""
    import flax.serialization
    os.makedirs(save_path, exist_ok=True)
    path = osp.join(save_path, f"{model_name}_{epoch}_epoch.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    return path
