"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Per SURVEY.md §4: multi-device paths are tested without a TPU cluster via
``xla_force_host_platform_device_count``; benchmarks (bench.py) run on the real chip.
These env vars must be set before the first ``import jax`` anywhere in the process.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# The container's axon sitecustomize force-registers the TPU backend and sets
# jax.config.jax_platforms = "axon,cpu" programmatically, overriding the env var.
# Tests must NOT touch the TPU (the tunnel supports a single client process;
# a second one wedges it), so pin the config back to cpu before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
