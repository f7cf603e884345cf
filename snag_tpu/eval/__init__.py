from snag_tpu.eval.ranking import (  # noqa: F401
    pairwise_distances, csls_sim, full_rank_eval, RankResult,
)
