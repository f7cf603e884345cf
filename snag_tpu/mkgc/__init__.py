"""MKGC — multi-modal knowledge graph completion workload.

The reference repo ships only a readme for this workload
(/root/reference/SNAG_MKGC/readme.md); the trainer here is rebuilt to that
CLI contract (run_base.sh positional args, default hyperparameters, the
five ``joint_way`` fusion variants, epoch/step noise cadence, pooled
features) with the architecture filled in from the shared MMEA fusion code
and the paper (arXiv:2403.06832).
"""

from snag_tpu.mkgc.config import MKGCConfig, build_mkgc_argparser  # noqa: F401
from snag_tpu.mkgc.data import MKGCData, load_mkgc_data  # noqa: F401
from snag_tpu.mkgc.model import MKGCModel  # noqa: F401
