from snag_tpu.ops.segment import spmm, segment_normalize  # noqa: F401
from snag_tpu.ops.gnn import GCN, GAT  # noqa: F401
from snag_tpu.ops.fusion import (  # noqa: F401
    MformerFusion, WeightedConcatFusion, MeanFusion,
)
from snag_tpu.ops import noise  # noqa: F401
