"""Test env: force an 8-device virtual CPU mesh before JAX import.

Distributed tests run against --xla_force_host_platform_device_count=8
(SURVEY.md §4 "Distributed tests without a pod"). Set TPUGS_TEST_TPU=1 to
run the suite on real TPU hardware instead.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "")

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("TPUGS_TEST_TPU", "0") != "1":
    # The interpreter may pre-import jax (sitecustomize), so env vars are
    # too late — use config updates, which apply until backends initialize.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
