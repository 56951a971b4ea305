"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is exercised by bench.py and the driver's compile checks; unit
tests validate math and sharding on CPU so they run anywhere.
"""

import os

# Force CPU even when the environment selects a TPU platform (e.g. axon):
# unit tests validate math/sharding and must run anywhere, fast.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon plugin force-selects jax_platforms="axon,cpu" regardless of the
# env var; pin the config explicitly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


# Heaviest interpret-mode kernel cases (>~8 s each on CI-class CPUs),
# deselected by default via addopts = -m 'not slow' (pyproject.toml).
# Kept criteria: every kernel path (fused 2x/4x, gather, epilogue, uint8,
# sharding) retains at least one interpret-mode case in the default run.
# Centralized here so the cost/coverage trade-off is reviewable in one place.
_SLOW = {
    "test_pallas_fused.py::test_fused_4x",
    "test_pallas_fused.py::test_fused_batched",
    "test_pallas_fused.py::test_fused_denoise",
    "test_pallas_fused.py::test_fused_isolated_bright_pixel",
    "test_pallas_fused.py::test_fused_matches_xla_2x[in_hw0-out_hw0]",
    "test_pallas_fused.py::test_fused_matches_xla_2x[in_hw2-out_hw2]",
    "test_pallas_fused.py::test_fused_easu_only",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw10-out_hw10]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw9-out_hw9]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw7-out_hw7]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw0-out_hw0]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw2-out_hw2]",
    "test_fuzz_sizes.py::test_fuzz_uint8_roundtrip[in_hw4-out_hw4]",
    "test_fuzz_sizes.py::test_fuzz_uint8_roundtrip[in_hw0-out_hw0]",
    "test_uint8.py::test_fused_u8_batched_with_epilogue",
    "test_uint8.py::test_fused_u8_in_matches_decoded",
    "test_uint8.py::test_fused_u16_out_codes",
    "test_uint8.py::test_fused_u16_dithered_10bit_codes",
    "test_uint8.py::test_fused_u8_dithered_display_codes",
    "test_uint8.py::test_gather_u16_roundtrip",
    "test_epilogue.py::test_fused_2x_epilogue[epi0]",
    "test_epilogue.py::test_fused_2x_epilogue[epi1]",
    "test_epilogue.py::test_fused_2x_epilogue[epi4]",
    "test_epilogue.py::test_gather_epilogue[epi0]",
    "test_epilogue.py::test_gather_epilogue_easu_only",
    "test_epilogue.py::test_fused_2x_epilogue_easu_only",
    "test_epilogue.py::test_fused_texture_dither",
    "test_epilogue.py::test_fused_srtm_prologue",
    "test_parallel.py::test_spatial_sharded_kernel_path_interpret",
    "test_parallel.py::test_batch_sharded_matches_single",
    "test_parallel.py::test_spatial_sharded_batched",
    "test_parallel.py::test_spatial_plus_batch_mesh",
    "test_parallel.py::test_spatial_sharded_matches_single[2]",
    # General-ratio sharding: the col-gather kernel case stays fast
    # (the production 1.3x/1.7x route); the 1.5x-hybrid variant + texture
    # dither + 2 of 3 XLA ratios run in the full suite.
    "test_parallel.py::test_spatial_sharded_general_kernel_interpret[in_hw0-out_hw0]",
    "test_parallel.py::test_spatial_sharded_texture_dither_kernel_interpret",
    "test_parallel.py::test_spatial_sharded_general_easu_only",
    "test_parallel.py::test_spatial_sharded_general_xla[in_hw1-out_hw1-2]",
    "test_parallel.py::test_spatial_sharded_general_xla[in_hw2-out_hw2-3]",
    "test_parallel.py::test_spatial_sharded_matches_single[4]",
    # RGBA kernels: one fused + one gather case stay fast.
    "test_pallas_fused.py::test_fused_rgba_alpha_epilogue",
    "test_pallas_fused.py::test_fused_rgba_alpha_bf16_easu_only",
    "test_kernels_general.py::test_easu_gather_rgba_alpha[in_hw0-out_hw0]",
    "test_kernels_general.py::test_easu_gather_rgba_alpha[in_hw1-out_hw1]",
    "test_epilogue.py::test_fused_2x_epilogue[epi2]",
    "test_fuzz_sizes.py::test_fuzz_uint8_roundtrip[in_hw6-out_hw6]",
    "test_kernels_general.py::test_easu_gather_fused_rcas[in_hw4-out_hw4]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw1-out_hw1]",
    "test_fuzz_sizes.py::test_fuzz_dispatchable_kernels_match_xla[in_hw8-out_hw8]",
    "test_parallel.py::test_spatial_sharded_fuzz_ratios",
    "test_kernels_general.py::test_easu_gather_matches_xla[in_hw0-out_hw0]",
    "test_kernels_general.py::test_easu_gather_matches_xla[in_hw4-out_hw4]",
    "test_kernels_general.py::test_easu_gather_drs_offset",
    # Gather in-kernel pad A/B: the hybrid (in_hw0), col-gather (in_hw1)
    # and fallback-replan cases stay fast; ragged/bf16/easu-only variants
    # run in the full suite.
    "test_kernels_general.py::test_gather_ablation_modes_construct",
    "test_kernels_general.py::test_gather_inkernel_pad_bit_equal[in_hw2-out_hw2-float32-True]",
    "test_kernels_general.py::test_gather_inkernel_pad_bit_equal[in_hw3-out_hw3-bfloat16-True]",
    "test_kernels_general.py::test_gather_inkernel_pad_bit_equal[in_hw4-out_hw4-float32-False]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
