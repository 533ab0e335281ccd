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
