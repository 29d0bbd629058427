"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on the
standard XLA host-platform device simulation (SURVEY.md §4e).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# A pytest plugin may import jax before this conftest runs; force the
# platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


# ---------------------------------------------------------------------------
# Fast tier (VERDICT r3 #6): `pytest -m "not slow"` is the short-round smoke
# suite (~3-5 min cold); the full suite is unchanged. Centralized by name —
# measured call times from the round-4 full run (--durations), threshold
# >= 10 s on the 1-core host. Tests added later that are expensive should
# either appear here or carry @pytest.mark.slow directly.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_two_process_train_step",              # 498 s
    "test_realize_batch_managed_retries_and_flags",
    "test_full_cli_workflow",
    "test_count_helices_tracks_ground_truth",
    "test_minimization_recovers_structure",
    "test_serve_cli",
    "test_tm_score_rigid_transform_is_one_multi_length",
    "test_multi_step_matches_k_single_steps",
    "test_remat_resblocks_matches_no_remat",
    "test_norm_dtype_model_close_to_f32",
    "test_quality_loop_smoke",
    "test_sp_matches_dp_loss",
    "test_checkpoint_roundtrip",
    "test_prepare_then_train_then_sample",
    "test_featurize_on_device_loss_matches_precomputed",
    "test_mesh_sharded_train_step",
    "test_mesh_dp_x_fsdp",
    "test_mesh_sequence_parallel",
    "test_ddim_sampler_and_loss",
    "test_realize_batch",
    "test_tm_score_shifted_fragment",
    "test_motif_scaffolding_fixes_region",
    "test_checkpoint_meta_overwrite_is_crash_safe",
    "test_checkpoint_restore_newest_and_abstract_template",
    "test_featurize_batch_jax_matches_host",
    "test_checkpoint_meta_recovers_mid_swap_states",
    "test_checkpoint_async_best_and_stale_tmp_purge",
    "test_unet_forward_parity",                 # + 30 s torch setup
    "test_context_dropout_nulls_context",
    "test_train_step_decreases_loss",
    "test_pdb_mask_conditioning_cli",
    "test_ema_warmup_decay",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
