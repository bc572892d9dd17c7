"""Test harness: run everything on a virtual multi-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with virtual devices, per the project
environment contract. 14 devices (not 8) so the camera-ring shardings the
hardware would use — ring=7 and ring=14 over the 14 side cameras — are
exercised for real, not just ring=2."""

import os

_TPU_SMOKE = os.environ.get("S360_TPU_SMOKE") == "1"
if not _TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=14"
        ).strip()

import jax  # noqa: E402

# the axon TPU plugin's sitecustomize sets jax_platforms via jax.config,
# which overrides the JAX_PLATFORMS env var — force CPU at the same level.
# S360_TPU_SMOKE=1 (tests/test_tpu_smoke.py on the bench box) keeps the
# real TPU platform instead.
if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# flow pyramids compile many per-shape programs; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
