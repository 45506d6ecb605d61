"""Test harness: virtual 8-device CPU mesh (the JAX-native way to test
pjit/shard_map without a TPU pod — SURVEY.md §4), deoptimized XLA compiles,
and a two-tier suite.

Tiers (this box has ONE cpu core; the full suite is compile-bound):
  default            fast tier, ~6 min cold (362 s measured on this box with
                     a warm persistent compile cache; first-ever run pays
                     full XLA compiles and lands ~8-9 min):
                     every subsystem's cheapest meaningful tests + the
                     FULL-BRANCH CHAP step compile at tiny shapes
  CHAP_SLOW_TESTS=1  everything: all train-step/trainer e2e compiles, the
                     full torch parity + converter matrix, the wide zoo
                     forwards (~25-40 min cold; the persistent compilation
                     cache under .jax_cache/ makes repeats much faster)

XLA flags: tests need correct code fast, not fast code —
--xla_backend_optimization_level=0 + disabled expensive LLVM passes halve
CPU compile times (measured 123 s -> 62 s on the CHAP step) without changing
op semantics.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported by a pytest plugin, in which case the env var
# was read too early — force the config value before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Slow tier: heavyweight compiles and wide-model forwards, every one of them
# a deeper variant of something the fast tier still covers. Format:
# "file.py" (whole file) or "file.py::test_name".
_SLOW = {
    # trainer e2e loops (the driver separately compiles + runs the FULL
    # CHAP step over an 8-device mesh every round via
    # __graft_entry__.dryrun_multichip, so e2e coverage is never skipped in
    # practice)
    "test_trainer_e2e.py::test_supervised_trainer_e2e",
    "test_trainer_e2e.py::test_chap_trainer_e2e_and_resume",
    "test_trainer_e2e.py::test_trainer_3d_e2e_chap_and_resume",
    "test_trainer_e2e.py::test_trainer_3d_e2e_cps",
    "test_trainer_e2e.py::test_share_trainer_e2e",
    # train-step variants beyond the supervised + full-CHAP-2D pair
    "test_train_steps.py::test_chap_step_3d_full_branches",
    "test_train_steps.py::test_ablation_step_full_branches",
    "test_train_steps.py::test_chap_step_baseline_branch",
    "test_train_steps.py::test_chap_step_loss_decreases_over_steps",
    # (test_chap_step_full_branches is deliberately FAST-tier: the default
    # suite must compile the flagship full-branch graph at tiny shapes)
    "test_step_chap_split.py",
    # 3D config smokes: brats (cheapest) stays fast as the YAML+CLI-path
    # representative; la/pancreas compile the full-CHAP 3D step (~158 s cold)
    "test_cli_3d_configs.py::test_la_chap_config_smoke",
    "test_cli_3d_configs.py::test_pancreas_chap_config_smoke",
    "test_models_zoo2.py::test_discriminators",
    "test_models_zoo.py::test_attention_unet_3d_forward",
    # torch-reference parity matrix (the converter's dualdecoder-mcnet test
    # exercises the same weight-copy layouts fast-tier)
    "test_reference_parity.py",
    "test_swin_parity.py",
    "test_convert.py::test_convert_dualdecoder[same]",
    "test_convert.py::test_convert_vnet",
    "test_convert.py::test_convert_unet3d",
    # pretrained ingestion (rule correctness is covered by the cheap
    # patch_first_conv test; these add full-model forwards)
    "test_pretrained_ingest.py::test_efficientnet_ingestion_rgb",
    "test_pretrained_ingest.py::test_efficientunet_forward_after_ingestion",
    "test_pretrained_ingest.py::test_get_encoder_multi_arch",
    "test_pretrained_ingest.py::test_efficientnet_patch_first_conv_single_channel",
    # wide zoo forwards (each family keeps a cheaper representative fast)
    "test_models_zoo.py::test_dsnet_train_and_eval",
    "test_models_zoo.py::test_unet_cct_and_urpc_forward",
    "test_models_zoo2.py::test_efficient_unet_forward",
    "test_models_zoo2.py::test_swin_unet_forward",
    "test_models_zoo2.py::test_swin_unet_shifted_windows",
    "test_models_zoo2.py::test_timing_harness",
    "test_models_zoo2.py::test_resvnet_forward",
    "test_models_zoo2.py::test_kmax_transformer_decoder",
    "test_models_zoo2.py::test_enet_forward_and_train",
    "test_models_zoo3.py::test_resnet_3d_and_dilated_last_stage",
    "test_models_zoo3.py::test_resnet_2d_pyramid",
    "test_swin_decoder.py::test_swin_decoder_forward",
    "test_swin_decoder.py::test_swin_decoder_projector_head",
    "test_models.py::test_dualdecoder_train_mode_mutable_stats",
    "test_share_steps.py::test_decoder_max_step_freezes_encoder",
    "test_share_steps.py::test_encoder_min_step_freezes_decoders",
    "test_eval2d.py::test_predict_volume_shapes_and_zoom",
    "test_losses.py::test_vat_loss_runs_and_positive",
}


def _is_slow(item) -> bool:
    fname = item.fspath.basename
    if fname in _SLOW or f"{fname}::{item.name}" in _SLOW:
        return True
    name = item.name.split("[")[0]
    return f"{fname}::{name}" in _SLOW


def pytest_collection_modifyitems(config, items):
    if os.environ.get("CHAP_SLOW_TESTS"):
        return
    marker = pytest.mark.skip(
        reason="slow tier (heavy compile); run with CHAP_SLOW_TESTS=1")
    for item in items:
        if _is_slow(item):
            item.add_marker(marker)


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
