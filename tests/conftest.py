"""Test configuration: run JAX on CPU with 8 virtual devices.

The environment pre-imports jax bound to the TPU (sitecustomize); tests must
run on a virtual 8-device CPU mesh instead (SURVEY.md §4 test strategy), so we
re-point the platform via jax.config before any backend is initialized.
"""
import os

# ONEPOSE_TESTS_TPU=1 leaves the default (TPU) backend in place so the
# `tpu`-marked compiled-parity tests can run on the real chip:
#   ONEPOSE_TESTS_TPU=1 python -m pytest tests/test_tpu_compiled.py -q
_USE_TPU = os.environ.get("ONEPOSE_TESTS_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# jax is pre-imported by the environment's sitecustomize, so the env vars
# above arrive too late for the in-process backend — set the persistent
# compile cache on the live config (repeat suite runs then skip XLA compiles,
# the bulk of the fast selection's wall time)
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
