from snag_tpu.train.optim import build_optimizer, make_lr_schedule  # noqa: F401
from snag_tpu.train.step import TrainState, make_train_step, make_embed_fn  # noqa: F401
from snag_tpu.train.runner import Runner  # noqa: F401
