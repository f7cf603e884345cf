from snag_tpu.utils.logging import initialize_exp, get_dump_path, create_logger  # noqa: F401
from snag_tpu.utils.seed import set_seed  # noqa: F401
from snag_tpu.utils.loss_log import LossLog  # noqa: F401
