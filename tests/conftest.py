"""Test harness: simulate an 8-device TPU mesh on CPU.

Multi-chip behavior is validated without a cluster via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4.3).

This machine routes JAX to a remote TPU tunnel by default (JAX_PLATFORMS
is pinned by the site environment), so the env var alone is not enough —
jax.config.update('jax_platforms', 'cpu') is authoritative and must run
before the backend initializes; pytest imports conftest first.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
