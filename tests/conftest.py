"""Test environment: force an 8-device virtual CPU platform so sharding
tests exercise multi-chip behavior without a TPU pod (SURVEY.md §4)."""

import os

# The harness env pins JAX_PLATFORMS (e.g. to a TPU plugin); override hard —
# tests must run on a virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from snag_tpu.config import Config, finalize_config  # noqa: E402


@pytest.fixture(scope="session")
def synth_cfg():
    cfg = Config(
        data_choice="SYNTH", model_name="SNAG", batch_size=32, epoch=4,
        eval_epoch=2, lr=5e-4, hidden_units="64,64,64", heads="2,2",
        attr_dim=64, img_dim=64, name_dim=64, char_dim=64, hidden_size=64,
        intermediate_size=128, num_attention_heads=2, num_hidden_layers=1,
        structure_encoder="gat", tau=0.1, tau2=4.0, scheduler="cos",
        use_surface=0, inner_view_num=4, add_noise=1, noise_ratio=0.2,
        mask_ratio=0.5, random_seed=42, synth_ents=120, synth_rels=10,
        synth_triples=400, synth_img_dim=32, exp_name="test", log_every=1000,
    )
    return finalize_config(cfg, data_root="/tmp/snag_test_data")


@pytest.fixture(scope="session")
def synth_data(synth_cfg):
    from snag_tpu.data.dataset import load_data
    return load_data(synth_cfg)
