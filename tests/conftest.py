"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the JAX-idiomatic way to test multi-chip sharding without real
hardware (see SURVEY.md §4): all sharding/collective tests run against 8
virtual CPU devices.

Subtlety: on this machine an axon ``sitecustomize`` triggers JAX's flag
parsing at interpreter startup, so setting ``XLA_FLAGS`` from inside an
already-running process is silently ignored (observed: 1 CPU device instead
of 8). Fix: when the environment wasn't prepared before startup, re-exec
pytest once with the right env -- after restoring pytest's captured stdio so
the re-exec'd run's output reaches the terminal.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"


def _env_ready() -> bool:
    return (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
        and os.environ.get("JAX_PLATFORMS", "") == "cpu"
    )


_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _guard_cache() -> str:
    """Stale-cache guard (ROADMAP r5 #4): CPU AOT entries compiled on a
    previous VM's CPU SIGILL the suite mid-run; key the cache dir by a CPU
    feature fingerprint and wipe on mismatch (clean cold run instead).
    Runs before JAX initializes — both in the pre-re-exec parent and when
    the caller prepared the env themselves (no re-exec)."""
    if _ROOT not in sys.path:
        sys.path.insert(0, _ROOT)
    from eo_diffusion_tpu.utils.cache_guard import ensure_cache_matches_cpu

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        _ROOT, ".jax_cache_tests")
    state = ensure_cache_matches_cpu(cache)
    if state == "wiped":
        print(f"[conftest] {cache}: CPU features changed since the cache "
              "was written — wiped (cold run)", file=sys.stderr)
    return cache


def pytest_configure(config):
    cache = _guard_cache()
    if os.environ.get("_EO_TESTS_REEXEC") == "1" or _env_ready():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["_EO_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _FLAG).strip()
    # The axon TPU-tunnel sitecustomize (gated on PALLAS_AXON_POOL_IPS)
    # breaks xla_force_host_platform_device_count even when set at startup;
    # tests are CPU-only, so drop it from the child environment entirely.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if "axon" not in p
    )
    # persistent XLA compile cache: the suite is dominated by single-core CPU
    # compiles of many small model configs; warm reruns are minutes faster
    env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Smoke tier (VERDICT r3 item 8): `pytest -m smoke` runs one fast happy-path
# test per module (<5 min warm on the single host core) so cold-VM iteration
# doesn't cost the full ~2 h suite. The full suite remains the default.
# ---------------------------------------------------------------------------

# module basename -> test-function name (prefix match, so parametrized
# variants are included). Chosen for breadth-per-second: cheap unit checks
# everywhere, plus one real CLI train->infer roundtrip (test_cli) and the
# two-process rendezvous (test_distributed) as the integration smokes.
_SMOKE = {
    "test_alt_backbones.py": "test_mnist_shape",
    "test_autoguide.py": "test_extrapolation_math",
    "test_aux.py": "test_band_enums",
    "test_bridge.py": "test_marginal_endpoints",
    "test_classifier_guidance.py": "test_logits_shape",
    "test_cli.py": "test_checkpoints_written",
    "test_consistency.py": "test_boundary_identity_at_t0",
    "test_controlnet.py": "test_zero_init_is_exact_identity",
    "test_convert.py": "test_flax_torch_flax_identity",
    "test_data.py": "test_grid_shape_and_content",
    "test_deepcache.py": "test_splice_is_exact",
    "test_device_cache.py": "test_store_dtype_policy",
    "test_diffusion.py": "test_t0_nearly_clean",
    "test_distill.py": "test_given_noise_pins_the_target",
    # test_distributed.py deliberately absent: its 2-OS-process rendezvous
    # pays ~135 s of fresh subprocess compiles — full-suite only
    # (mesh/sharding smoke coverage comes from test_sample_dp/test_ring)
    "test_dit.py": "test_shape_and_zero_init",
    "test_dpm_solver.py": "test_oracle_convergence_few_steps",
    "test_edit.py": "test_bounds",
    "test_edm.py": "test_weight_times_cout_sq_is_one",
    # test_examples.py deliberately absent: each demo subprocess pays a
    # fresh ~10 s jax startup (4 demos ~45 s) — full-suite only
    "test_feature_cnn.py": "test_learns_above_chance",
    "test_flow.py": "test_zero_for_perfect_model_at_known_t",
    "test_freeu.py": "test_backbone_half_channel_scaling",
    "test_inception.py": "test_output_shapes_and_param_count",
    "test_inverse.py": "test_sr_right_inverse",
    "test_latent.py": "test_shapes",
    "test_lora.py": "test_zero_init_is_identity",
    "test_meanflow.py": "test_analytic_field_has_zero_loss",
    "test_metrics.py": "test_identity_is_one",
    "test_moe.py": "test_single_expert_equals_dense_mlp",
    "test_muon.py": "test_singular_values_near_one",
    "test_native.py": "test_numpy_native_parity",
    "test_objectives.py": "test_v_target_identity",
    "test_ops.py": "test_matches_manual_softmax",
    "test_pag.py": "test_returns_values_both_layouts",
    "test_pipeline.py": "test_stack_shape_and_order",
    "test_pipeline_train.py": "test_grads_match_sequential",
    "test_posthoc_ema.py": "test_default_gammas_are_the_paper_pair",
    "test_presets.py": "test_unet_presets_build_unet",
    "test_progressive.py": "test_endpoints_and_monotone",
    "test_quantize.py": "test_roundtrip_error_bound",
    "test_reference_parity.py": "test_unet_forward_bit_parity",
    "test_ring.py": "test_matches_xla_forward",
    "test_sample_dp.py": "test_ddim_unet_sharded_matches",
    "test_schedules.py": "test_matches_reference_formula_float32",
    "test_serving.py": "test_concurrent_requests_coalesce",
    "test_skip_nonfinite.py": "test_bad_step_leaves_params_untouched_then_recovers",
    "test_spade_cli.py": "test_model_config_builds_spade",
    "test_superres.py": "test_degrade_is_blockwise_mean",
    "test_tiff_native.py": "test_13band_uint16_strips",
    "test_tiled.py": "test_exact_cover",
    "test_tome.py": "test_disjoint_cover",
    "test_train.py": "test_update_formula",
    "test_unet.py": "test_forward_shape",
    "test_unipc.py": "test_matches_official_transcription",
    "test_wrapper.py": "test_none",
}


def pytest_collection_modifyitems(config, items):
    smoke = pytest.mark.smoke
    for item in items:
        fname = os.path.basename(str(item.fspath))
        want = _SMOKE.get(fname)
        if want and item.name.split("[")[0] == want:
            item.add_marker(smoke)
