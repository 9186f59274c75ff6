"""Test configuration: run on CPU with 8 virtual devices so the multi-chip
sharding paths execute in CI without a pod (SURVEY §4).

The container's sitecustomize registers the axon TPU backend at interpreter
start, so the env-var route alone doesn't stick — jax.config.update does.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
