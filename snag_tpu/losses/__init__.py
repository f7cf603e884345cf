from snag_tpu.losses.contrastive import icl_loss, ial_loss, nca_loss  # noqa: F401
from snag_tpu.losses.multitask import KendallLossLayer, AutomaticWeightedLoss  # noqa: F401
