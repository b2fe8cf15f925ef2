"""Test configuration: run everything on a virtual 8-device CPU mesh.

Emulates an 8-chip TPU slice for the sharding/distribution tests per
SURVEY.md §4's multi-host test strategy.  Note: the axon sitecustomize
sets jax.config.jax_platforms programmatically, which overrides the
JAX_PLATFORMS env var — so we must override via jax.config too, before
any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
