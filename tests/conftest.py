"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on the real TPU chip; tests must be hermetic and
multi-device-capable, so we force the CPU platform with 8 virtual devices
(SURVEY.md §4: multi-host tests via CPU simulation).

Note: the axon sitecustomize sets jax_platforms via jax.config at interpreter
start, so overriding the environment variable alone is not enough — we must
update the config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
