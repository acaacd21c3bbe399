"""Test configuration: force an 8-device virtual CPU platform (default),
or — with ``COLUMNFLOW_TPU_TESTS=1`` — leave the real TPU backend active
for the compiled-kernel tier (``-m tpu``, tests/test_tpu_compiled.py).

The default tier never needs a real TPU; sharding tests use a virtual
8-device CPU mesh (the same mechanism the driver uses for the multi-chip
dry-run), and Pallas kernels run in interpret mode. The TPU tier compiles
every Pallas kernel through Mosaic on the bench chip so a lowering
regression (new JAX pin, new workaround needed) fails CI-style instead of
only surfacing as a bench crash:

    COLUMNFLOW_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Note: this machine's sitecustomize registers a TPU PJRT plugin and
overrides JAX_PLATFORMS in-process, so the env var alone is not enough —
we must also update jax.config before any backend initializes (they
initialize lazily on first device use, which is after conftest import).
"""

import os

import pytest

TPU_TIER = os.environ.get("COLUMNFLOW_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache (round-4 gate-time work): the suite is
    # compile-dominated on this single-core box, and the per-module
    # in-memory cache clear below (required for compiler stability) forces
    # recompiles that the disk cache then serves. Measured: repeat module
    # runs ~35% faster; the round-close gate re-runs the same code state
    # and gets warm-cache time. The directory is repo-local and
    # gitignored.
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_threefry_partitionable", True)


# Smoke tier: one (fast, representative) test per subsystem, applied as a
# marker at collection time so the selection lives in one place. Target
# budget < 5 min on this box (the full suite is ~40 min); run with
#     python -m pytest tests/ -m smoke -q
SMOKE_NODE_PREFIXES = (
    # L1 config + ops
    "tests/test_ops.py::TestTransfer",
    "tests/test_models.py::TestWeightConstruction::test_golden_wta_anatomy",
    # L2 models: golden parity vs the reference's own torch class
    "tests/test_golden_drift.py::TestWTADriftGolden",
    # L3 ODE engine
    "tests/test_ode.py::TestDopri5::test_exp_decay_tight",
    "tests/test_odeint_options.py::TestStepSize::test_matches_manual_fine_grid",
    "tests/test_esdirk.py::TestKvaerno3::test_stiff_linear_accuracy",
    "tests/test_event.py::TestEventDetection::test_threshold_crossing_time",
    # L3 SDE engine
    "tests/test_sde.py::TestBasics::test_zero_diffusion_matches_ode",
    "tests/test_sde_adaptive.py::TestAdaptiveSDE::test_reproducible",
    "tests/test_sde_adjoint.py::TestStratonovichMethods::test_gbm_pathwise_exact",
    "tests/test_sde_general.py::TestGeneralNoiseConsistency::test_diagonal_embedding_matches",
    "tests/test_sde_logode.py::TestLevyPack::test_moments",
    "tests/test_sde_logqp.py::TestClosedForm::test_zero_when_prior_equals_posterior",
    "tests/test_sde_reversible.py::TestReversibleHeunMethod::test_gbm_pathwise_exact",
    "tests/test_sde_implicit.py::TestLinearClosedForm::test_one_step_matches_backward_euler_formula",
    "tests/test_brownian.py::TestVBT::test_deterministic_queries",
    "tests/test_sde_adaptive.py::TestFrozenGridAPI::test_select_plus_replay_bit_exact",
    "tests/test_sde_adjoint.py::TestAdaptiveAdjoint::test_forward_matches_adaptive_replay_exactly",
    "tests/test_sde_logode.py::TestApproximationLevels::test_space_time_level",
    "tests/test_odeint_options.py::TestStepBounds::test_first_step_aliases_dt0",
    "tests/test_brownian_interval.py::TestPathConsistency::test_additivity",
    "tests/test_krng.py::TestThreefry::test_matches_jax_threefry",
    # L3 kernels (interpret mode)
    "tests/test_fused.py::TestFusedSolver::test_trajectory_parity",
    "tests/test_kernels.py::TestFusedDrift::test_matches_xla_drift",
    # parallel / train / native
    "tests/test_parallel.py::TestDPTraining::test_dp_matches_single_device",
    "tests/test_parallel.py::TestMultiHost",
    "tests/test_train.py::TestOptimizerTorchParity::test_rmsprop_wta_settings",
    "tests/test_train.py::TestMasksAndClamps",
    "tests/test_native.py::TestPhiloxRNG::test_deterministic",
    # L4 tasks + L5 analysis
    "tests/test_tasks.py::TestXORTask::test_smoke",
    "tests/test_tasks.py::TestLatentSDETask",
    "tests/test_analysis.py::TestStats::test_dominance_time_alternating_signal",
)

# Slow tier (round-4 VERDICT "Next" #5: cap the default gate at <= 30
# min): the LONG-TAIL tests — at-scale parity sweeps whose subject is
# separately witnessed by an always-on small variant, statistical/
# convergence-order studies, and per-task duplicates of engine paths that
# another task keeps exercising every run. They are SKIPPED (visibly) by
# the default `pytest tests/` and run with
#     COLUMNFLOW_SLOW_TESTS=1 python -m pytest tests/ -m slow -q
# at round close / when their subsystem changed. Nothing is deleted; the
# default gate keeps at least one always-on representative of every
# subsystem these cover.
SLOW_TESTS_ON = os.environ.get("COLUMNFLOW_SLOW_TESTS") == "1"
SLOW_NODE_PREFIXES = (
    # TP at full scale (small always-on representative:
    # TestTPFullScale::test_tp_stochastic_adaptive_matches_unsharded_small
    # + the scale-representative dryrun mode)
    "tests/test_parallel.py::TestTPFullScale::test_tp_loss_parity_full_horizon_104_columns",
    "tests/test_parallel.py::TestTPFullScale::test_tp_full_parity_208_columns",
    "tests/test_parallel.py::TestTPFullScale::test_tp_full_parity_104_columns",
    "tests/test_parallel.py::TestTPFullScale::test_tp_stochastic_adaptive_step_104_columns",
    # subsumed by TestTPTraining::test_tp_matches_unsharded
    "tests/test_parallel.py::TestTPTraining::test_tp_step_runs_sharded",
    # always-on representative: TestTaskDPSteps::test_parity_dp_step
    "tests/test_parallel.py::TestTaskDPSteps::test_parity_dp_step_stochastic_adaptive",
    # statistical tolerance/convergence studies
    "tests/test_sde_adaptive.py::TestAdaptiveSDE::test_tolerance_controls_error",
    "tests/test_sde_adaptive.py::TestAdaptiveSDE::test_euler_additive_noise",
    "tests/test_sde.py::TestDtSubstep::test_refinement_improves_strong_error",
    "tests/test_ode.py::TestDop853::test_dense_output_seventh_order",
    "tests/test_ode.py::TestDop853::test_endpoint_accuracy",
    "tests/test_legacy_scale.py::test_legacy_lr001_converges_lr10_does_not",
    # batched-replay method matrix (always-on representative: [sra1])
    "tests/test_sde_adaptive.py::TestBatchedReplay::test_matches_vmapped_per_sample[euler]",
    "tests/test_sde_adaptive.py::TestBatchedReplay::test_matches_vmapped_per_sample[milstein]",
    "tests/test_sde_adaptive.py::TestLargeNetworkStability",
    # cross-method column-physics rollouts (convergence studies)
    "tests/test_esdirk.py::TestColumnStiff::test_xor_rollout_matches_dopri5",
    "tests/test_esdirk.py::TestColumnStiff::test_parity_task_method_plumbing",
    # checkpoint/resume plumbing x 4 tasks (always-on representative:
    # TestWTAResume::test_checkpoint_resume_fast_path)
    "tests/test_tasks.py::TestParityTask::test_checkpoint_resume",
    "tests/test_tasks.py::TestXORResume::test_checkpoint_resume",
    "tests/test_tasks.py::TestBifurcationResume::test_checkpoint_resume",
    # XOR-side stochastic/fused matrix (parity-side equivalents always on)
    "tests/test_tasks.py::TestXORStochastic",
    "tests/test_tasks.py::TestXORTask::test_fused_pass_rollout_and_grads",
    "tests/test_tasks.py::TestParityTask::test_loss_scale_is_gradient_noop",
    "tests/test_tasks.py::TestParityStochastic::test_fused_pass_rollout_and_grads[False]",
    # chunk-size equality at large size (smaller chunk variants always on)
    "tests/test_kernels.py::TestChunkedBackward::test_chunked_matches_unchunked",
    # vmap-compose of the adaptive adjoint (unbatched tests always on)
    "tests/test_sde_adjoint.py::TestAdaptiveAdjointBatch::test_vmap_over_keys",
    # docs/TUTORIAL.md worked example end-to-end (its subjects — odeint
    # training, sdeint, checkpointing — have always-on representatives in
    # test_ode.py / test_sde.py / test_train.py)
    "tests/test_examples.py::test_tutorial_example_end_to_end",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-TPU kernel tier (needs a real TPU and "
        "COLUMNFLOW_TPU_TESTS=1; auto-skipped otherwise)",
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast tier — one representative test per subsystem "
        "(< 5 min; applied at collection from conftest.SMOKE_NODE_PREFIXES)",
    )
    config.addinivalue_line(
        "markers",
        "slow: long-tail tier (at-scale sweeps, statistical convergence "
        "studies, cross-task duplicates) — skipped by the default gate; "
        "run with COLUMNFLOW_SLOW_TESTS=1 [-m slow] "
        "(conftest.SLOW_NODE_PREFIXES)",
    )
    # In TPU mode the rest of the suite assumes the 8-device CPU platform;
    # restrict collection to the tpu tier unless the caller said otherwise.
    if TPU_TIER and not config.option.markexpr:
        config.option.markexpr = "tpu"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state after each test module.

    A full-suite run performs thousands of XLA CPU compilations in one
    process; with all executables retained, the compiler eventually
    segfaults deep into the run (observed at ~75% in
    jax compiler.backend_compile_and_load — process-history-dependent:
    every module passes in isolation). Dropping the in-memory caches at
    module teardown keeps the compiler healthy; cross-module cache hits
    are rare, so the runtime cost is noise.
    """
    yield
    jax.clear_caches()


# Per-test budget guard (round-4 VERDICT #6 "Weak #4": the gate grew ~5
# min/round before the tiering and nothing enforced that new long-tail
# tests declare a tier). Any test in the DEFAULT tier (unmarked slow/tpu)
# whose call phase exceeds the budget is reported as FAILED with a
# declare-a-tier message — so regrowth is caught at birth, not at the
# next gate audit. Generous default (the suite is compile-dominated on a
# single core and a cold cache pays 30-40 s compiles); override with
# COLUMNFLOW_TEST_BUDGET_S, 0 disables.
TEST_BUDGET_S = float(os.environ.get("COLUMNFLOW_TEST_BUDGET_S", "150"))

# Documented exemptions: tests whose wall time is dominated by spawning
# fresh interpreters (cold-cache multi-process compiles), not by test
# size — shrinking them would remove what they verify. Keep this list
# SHORT and justified; everything else must fit the budget or declare a
# tier.
BUDGET_EXEMPT_PREFIXES = (
    # 2 jax.distributed worker processes compiling the real WTA-DP and
    # TP-parity steps concurrently on one core (~4 min cold cache,
    # ~1 min warm via the persistent cache).
    "tests/test_parallel.py::TestMultiHost",
)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if (TEST_BUDGET_S > 0 and report.when == "call" and report.passed
            and call.duration > TEST_BUDGET_S
            and "slow" not in item.keywords
            and "tpu" not in item.keywords
            and not any(item.nodeid == p or item.nodeid.startswith(p + "::")
                        for p in BUDGET_EXEMPT_PREFIXES)):
        report.outcome = "failed"
        report.longrepr = (
            f"{item.nodeid}: call took {call.duration:.1f}s > "
            f"{TEST_BUDGET_S:.0f}s default-tier budget. Long-tail tests "
            "must declare a tier at birth: add the node to "
            "conftest.SLOW_NODE_PREFIXES (slow tier) or mark it tpu, or "
            "shrink the test. Override: COLUMNFLOW_TEST_BUDGET_S "
            "(0 disables)."
        )


def pytest_collection_modifyitems(config, items):
    slow_requested = SLOW_TESTS_ON or "slow" in (config.option.markexpr
                                                 or "")
    slow_skip = pytest.mark.skip(
        reason="slow tier: COLUMNFLOW_SLOW_TESTS=1 (or -m slow) runs it; "
               "see conftest.SLOW_NODE_PREFIXES")
    for item in items:
        nid = item.nodeid
        if any(nid == p or nid.startswith(p + "::")
               for p in SMOKE_NODE_PREFIXES):
            item.add_marker(pytest.mark.smoke)
        if any(nid == p or nid.startswith(p + "::")
               for p in SLOW_NODE_PREFIXES):
            item.add_marker(pytest.mark.slow)
            if not slow_requested:
                item.add_marker(slow_skip)
    if TPU_TIER and jax.default_backend() != "cpu":
        return
    reason = (
        "TPU-compiled tier: run COLUMNFLOW_TPU_TESTS=1 python -m pytest "
        "tests/ -m tpu on a TPU host"
        if not TPU_TIER
        else "COLUMNFLOW_TPU_TESTS=1 set but no TPU backend is available"
    )
    skip = pytest.mark.skip(reason=reason)
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
