from snag_tpu.ops.pallas.segment_kernel import (  # noqa: F401
    pallas_available, sorted_segment_sum_pallas,
)
