"""MMEA trainer entry point (reference: SNAG_MMEA/main.py:502-529).

Usage mirrors the reference CLI:
    python -m snag_tpu.cli.train_mmea --model_name SNAG --data_choice DBP15K \
        --data_split ja_en --data_rate 0.3 ... (see run_snag.sh)
"""

from __future__ import annotations

import sys

from snag_tpu.config import build_argparser, config_from_args, finalize_config
from snag_tpu.train.runner import Runner
from snag_tpu.utils import initialize_exp, set_seed


def main(argv=None):
    import jax
    # rbg PRNG: vectorized on TPU; threefry's generation loops cost ~9 ms/step
    # at DBP15K scale for the noise tables (profiled)
    jax.config.update("jax_default_prng_impl", "rbg")

    # multi-host entry: no-op single-process, discovers JAX_*/torchrun/
    # SLURM env otherwise (reference distributed_utils.py:14-35's role);
    # must run before the first backend touch
    from snag_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()

    args = build_argparser().parse_args(argv)
    cfg = finalize_config(config_from_args(args))
    if cfg.compile_cache_dir:
        # persistent XLA cache: reruns of a config skip the 1-5 min tunnel
        # compile of the big jitted step
        jax.config.update("jax_compilation_cache_dir", cfg.compile_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    set_seed(cfg.random_seed)
    logger = initialize_exp(cfg)

    runner = Runner(cfg, logger)
    if cfg.only_test:
        if cfg.model_name_save:
            runner.load_model(cfg.model_name_save)
        runner.evaluate(last_epoch=True, save_name=f"{cfg.exp_id}_only_test")
    else:
        if cfg.model_name_save:
            runner.load_model(cfg.model_name_save)
        runner.run()
    logger.info("done!")


if __name__ == "__main__":
    main()
