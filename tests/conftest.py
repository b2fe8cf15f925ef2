"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (import side effects), so this
happens at conftest import time — emulating an 8-chip TPU slice for the
sharding/distribution tests per SURVEY.md §4's multi-host test strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
