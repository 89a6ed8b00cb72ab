"""Test harness configuration (SURVEY.md section 5).

The whole suite runs on CPU with 8 emulated devices so the full shard_map
mesh / collective paths execute without TPU hardware (SURVEY.md 5.4), with
x64 enabled so float64 oracles are exact.

NOTE: this image preloads jax at interpreter startup (sitecustomize on
PYTHONPATH), so JAX_PLATFORMS/XLA_FLAGS env vars set here would be TOO LATE
for jax's config — but XLA_FLAGS is still read lazily at CPU-client creation,
and the platform switch must go through jax.config.update.
"""

import os

# Read when the CPU backend initialises (lazily) — not at jax import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Per-op XLA-CPU compiles cost ~0.4 s in this image; cache them on disk so
# repeated test runs only pay once.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def co2_lines():
    from spectrobot_tpu.data.synth import co2_15um_band
    return co2_15um_band(j_max=40)


@pytest.fixture(scope="session")
def mars_atm():
    from spectrobot_tpu.data.atmosphere import mars_standard_atmosphere
    return mars_standard_atmosphere(n_lev=41, z_top=80e3)
