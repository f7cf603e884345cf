"""Pallas TPU kernels.

* tile_segment   — row-tile weighted segment reduction (GAT aggregation
                   core + generic sorted reduces);
* gat_attention  — fully-fused sparse-GAT attention + aggregation.

An earlier sliding-window segment kernel (segment_kernel.py) was
benchmarked against these on the real chip and removed (VERDICT r1
item 9): the row-tile design wins by writing each output row exactly
once instead of overlapping windows.
"""

from snag_tpu.ops.pallas.tile_segment import (  # noqa: F401
    TileStructure, build_tile_structure, pallas_available,
    tile_weighted_segment_sum, xla_weighted_segment_sum,
)
