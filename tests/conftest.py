"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(jax.sharding.Mesh over 'data'/'model' axes) are exercised without TPU
hardware. Must be set before jax initializes a backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container may pre-register a remote TPU PJRT plugin ("axon") via
# sitecustomize, which pins jax_platforms and costs ~1 min of tunnel
# handshake on first use. Tests must run on the virtual CPU mesh, so deselect
# it before any backend initializes (conftest runs before all test imports).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

if not _xb.backends_are_initialized():
    _xb._backend_factories.pop("axon", None)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not mounted"
)


# Compile-heavy / oracle-heavy tests (measured ≥~6 s each on the CPU test
# rig). `-m "not slow"` runs the core subset in under ~5 minutes; CI and
# pre-commit iterate on that, the full suite runs before a release/round
# end. Keep this list in sync when a new test shows up in
# `--durations=40` above the threshold.
_SLOW_TESTS = frozenset({
    "test_train_then_evaluate",
    "test_batched_equals_sequential", "test_mesh_sharded_equals_local",
    "test_wide_stream_group", "test_bucketing_invariance",
    "test_full_eval_parity",
    "test_runs_and_is_finite", "test_tp_cascade_eval",
    "test_matches_offline_cascade",
    "test_multi_stream_equals_independent_sessions",
    "test_multi_stream_soak_state_stability",
    "test_mesh_online_equals_single_device",
    "test_lookahead_exact_construction",
    "test_lookahead_depth2_exact_construction",
    "test_lookahead_reduces_offline_divergence",
    "test_lookahead_multi_stream_composes",
    "test_amass_pipeline", "test_factory_feeds_training",
    "test_dryrun_multichip_8", "test_dryrun_multichip_odd_device_count",
    "test_entry_compiles_and_runs",
    "test_padded_equals_exact",
    "test_state_carry_matches", "test_init_shapes_and_forward",
    "test_batched_streams_match_xla", "test_batched_streams_per_stream_lengths",
    "test_dense_lstm_pallas_masked", "test_dense_lstm_pallas_matches_xla",
    "test_dip_pallas_ad_matches_xla", "test_dirfused_matches_xla",
    "test_dispatch_falls_back_past_row_cap",
    "test_ggru_many_streams_match_xla", "test_ggru_multi_stream_net_dispatch",
    "test_ggru_pallas_masked", "test_ggru_pallas_matches_xla",
    "test_grad_falls_back_to_xla", "test_grad_through_pallas_equals_xla_grad",
    "test_jvp_through_pallas_matches_xla",
    "test_many_streams_chunked_match_xla", "test_many_streams_net_dispatch",
    "test_pallas_masked_matches_xla", "test_pallas_matches_xla",
    "test_pallas_nonzero_initial_state",
    "test_reference_runs_our_export",
    "test_early_stopping_and_checkpoints",
    "test_bf16_training_step", "test_dip_runner_bf16",
    "test_stage3_r6d_trains", "test_remat_matches_no_remat",
    "test_start_epoch_fast_forwards_lr",
    "test_sharded_equals_single_device",
    "test_tp_sharded_equals_single_device",
    "test_train_step_on_8_device_mesh",
    "test_a3gc_adjacency_trains", "test_agc_adjacency_frozen",
    "test_loss_decreases", "test_train_step_donates_state",
    "test_a3gc_step_dynamics_match_torch",
    "test_accumulated_equals_monolithic", "test_accum_trains_with_dropout",
    "test_graph_artifact_matches_live_session",
    "test_bundle_serves_multiple_geometries",
    "test_cli_export_bundle_and_serve_selects",
})


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile/oracle-heavy test; deselect with -m 'not slow' "
        "for the <5-minute core subset")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[", 1)[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_path():
    """Make the reference repo importable (for parity oracles only)."""
    if not has_reference():
        pytest.skip("reference implementation not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
