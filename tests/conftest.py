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
# persistent compilation cache (tests-only dir): the 330-test suite
# compiles hundreds of XLA CPU programs in one process; caching makes
# rerun compiles near-free and shrinks exposure to a rare LLVM-JIT
# compile crash observed in very long single-process runs
jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
