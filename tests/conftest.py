"""Hermetic test configuration: run everything on CPU with 8 virtual devices.

This is the test pyramid the reference never had (SURVEY.md §4 — it shipped zero
automated tests and relied on visual inspection). Kernel tests run on the XLA CPU
backend; sharding tests get an 8-device virtual mesh so multi-chip layouts compile and
execute without TPU hardware.

Note: the environment's sitecustomize force-registers the TPU platform, so the env-var
route (JAX_PLATFORMS=cpu) is not sufficient — we must also update jax.config after
import, before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (~34-80 min cold;
# identical jits recompile every run otherwise). Safe on CPU; keyed on HLO, so
# source changes miss cleanly.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
