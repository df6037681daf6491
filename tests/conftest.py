"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 we test
shard-parallel paths on 8 virtual CPU devices so mesh collectives
(all-gather top-k merge, psum centroid updates) execute for real.

The environment registers the TPU backend from sitecustomize and pins
JAX_PLATFORMS=axon before any test code runs, so plain env vars don't
work here — override through jax.config instead (must happen before the
first backend use).
"""

import os

# zero-egress environment: make HF hub lookups fail fast instead of
# hanging through connect timeouts (test_utils::test_registry_dispatch
# measured 69 s waiting on huggingface.co before the offline fallback)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# persistent XLA compilation cache: most of the suite's wall clock is
# XLA-CPU compiles of distinct program shapes on this 1-core host, and
# they repeat bit-identically run over run (warm cache measured 2.2x on
# the driver-pipeline tests). Env vars alone do NOT work for THIS
# process: the axon sitecustomize imports jax at interpreter start, so
# jax.config already materialized its env-var defaults before conftest
# runs — set the env for subprocess tests (multihost workers, bench
# smoke, graft-entry dryruns read it before their first jax import) AND
# jax.config for the in-process suite. Threshold 0: driver pipelines
# compile dozens of small sub-0.5s programs whose sum dominates.
_cache_dir = str(__import__("pathlib").Path(__file__).parent / ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", int(
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]))
# XLA-CPU (oneDNN) downgrades DEFAULT-precision f32 matmuls; tests compare
# against exact numpy references, so force true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
