"""Test config: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md §4). The environment's sitecustomize registers a remote 'axon'
TPU backend and forces jax_platforms='axon,cpu' *after* env vars are read,
so we must override the config again post-import — env vars alone are not
enough.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# fast/slow tiers: `pytest -m "not slow"` is the quick iteration gate
# (<2 min); the full suite remains the commit gate. Slow tests are marked
# centrally here (measured >=7s each on this 4-core host) so test files
# stay unannotated.
import pytest  # noqa: E402

SLOW_TESTS = {
    # multi-epoch config-driven trainers
    "test_pattern_spectra_config_trains_one_epoch",
    "test_lapeig_config_trains_one_epoch",
    # heavy model-family end-to-ends
    "test_arma_feta_model_trains",
    "test_feta_forward_and_grads",
    "test_gatedgcn_net_and_lapeig",
    "test_san_node_spectra_end_to_end",
    "test_san_trains_with_trainer",
    "test_san_net_variants",
    "test_lspe_net_forward_and_grads",
    "test_lspe_trains",
    "test_pna_net_trains",
    "test_gat_feta_net_trains",
    "test_molhiv_model_outputs",
    "test_molpcba_multitask_and_nan_labels",
    "test_san_lspe_net",
    "test_feta_non_sym_laplacian_norm",
    "test_feta_padding_invariance",
    "test_pcqm4m_regression",
    "test_eigvec_sign_flip_augmentation",
    # trainer overfit/e2e loops
    "test_stop_at_min_lr_and_per_epoch_ckpt",
    "test_overfit_regression_with_plateau",
    "test_overfit_node_classification",
    "test_overfit_graph_classification",
    "test_max_time_stop",
    "test_checkpoint_roundtrip",
    # packed tier
    "test_packed_trains",
    "test_packed_matches_unpacked_logits",
    "test_trainer_fits_packed_batches",
    # serving e2e
    "test_serve_main_end_to_end",
    "test_dynamic_batcher_concurrent_requests",
    # parity & sharding
    "test_san_training_trajectory_parity",
    "test_lspe_training_trajectory_parity",
    "test_fit_streamed_wire",
    "test_trainer_step_on_wire_batch",
    "test_debug_nan_guard",
    "test_accum_trains_with_batchnorm",
    "test_logit_parity_jax_vs_torch_twin",
    "test_logit_parity_batch_norm_train_mode",
    "test_logit_parity_packed_vs_twin",
    "test_scan_matches_unrolled",
    "test_fused_backward_matches_twin",
    "test_plain_sbm_and_molhiv_models",
    "test_transformer_gcn_model",
    "test_sharded_step_matches_single_device",
    "test_dryrun_multichip_entry",
}

SLOW_FILES = {"test_cli_smoke.py", "test_real_data_e2e.py",
              "test_feta_partitioned.py", "test_mixed_precision.py",
              "test_soak_resume.py", "test_feta_batched.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = getattr(item, "originalname", None) or item.name
        if base in SLOW_TESTS or item.path.name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
