"""Test harness: force the JAX CPU backend with 8 virtual devices.

The environment pins ``JAX_PLATFORMS=axon`` (one real TPU); tests run on a
deterministic 8-device virtual CPU mesh instead so multi-chip sharding paths are
exercised without hardware (SURVEY.md section 4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

# repo root on sys.path so the package imports without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
