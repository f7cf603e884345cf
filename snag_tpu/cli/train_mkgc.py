"""MKGC trainer entry point (reference CLI: SNAG_MKGC/readme.md:13-14).

    python -m snag_tpu.cli.train_mkgc --data_choice DB15K --num_proj 2 \
        --joint_way Mformer_hd_graph --noise_ratio 0.2 --mask_ratio 0.7 \
        --noise_update epoch --num_hidden_layers 1 --num_attention_heads 2
"""

from __future__ import annotations

from snag_tpu.mkgc.config import build_mkgc_argparser, mkgc_config_from_args
from snag_tpu.mkgc.train import MKGCRunner
from snag_tpu.utils import set_seed
from snag_tpu.utils.logging import create_logger


def main(argv=None):
    import jax
    # rbg PRNG: vectorized on TPU; threefry's generation loops cost ~9 ms/step
    # at DBP15K scale for the noise tables (profiled)
    jax.config.update("jax_default_prng_impl", "rbg")

    # multi-host entry: no-op single-process (see cli/train_mmea.py)
    from snag_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()

    args = build_mkgc_argparser().parse_args(argv)
    cfg = mkgc_config_from_args(args)
    cache = getattr(cfg, "compile_cache_dir", "/tmp/snag_tpu_compile_cache")
    if cache:
        # persistent XLA cache: reruns of a config skip the 1-5 min tunnel
        # compile of the whole-epoch scan
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    set_seed(cfg.random_seed)
    logger = create_logger(name="snag_tpu.mkgc")
    runner = MKGCRunner(cfg, logger)
    metrics = runner.run()
    logger.info(f"final: {metrics}")


if __name__ == "__main__":
    main()
