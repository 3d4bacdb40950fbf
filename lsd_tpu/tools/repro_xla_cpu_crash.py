"""Standalone repro for the XLA:CPU fatal crash class (VERDICT r4 #10).

Observed signatures on this image (jax 0.7-line, CPU backend):
  1. r4: a single pytest process compiling ~400 distinct XLA CPU
     programs dies with a fatal LLVM-JIT crash around the ~300th
     compile (inside backend_compile_and_load) — worked around by
     splitting the suite across two xdist workers (pytest.ini).
  2. r5: an xdist worker segfaulted INSIDE the persistent-cache
     deserialization path (Current thread in
     jax/_src/compilation_cache.py:238 get_executable_and_time <-
     compiler.py _cache_read), with every process logging
     cpu_aot_loader.cc warnings that cached executables carry target
     machine features the host check does not recognize
     ("+prefer-no-scatter ... could lead to execution errors such as
     SIGILL").

This script exercises both paths deterministically-ish, each mode in
THIS process (callers should run it under a supervisor shell and check
the exit code; a segfault exits 139):

  python -m lsd_tpu.tools.repro_xla_cpu_crash --mode compile  --n 600
  python -m lsd_tpu.tools.repro_xla_cpu_crash --mode cacheload --n 600 \
      --cache /tmp/repro_cache     # run TWICE: 2nd run loads all entries

Every program is made unique by baking a distinct constant + shape mix,
so neither the in-process nor the persistent cache can dedupe.
"""
from __future__ import annotations

import argparse
import faulthandler
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("compile", "cacheload"),
                    default="compile")
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--cache", default=None,
                    help="persistent cache dir (cacheload mode)")
    args = ap.parse_args(argv)

    faulthandler.enable()
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.mode == "cacheload":
        assert args.cache, "--cache required for cacheload mode"
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    for i in range(args.n):
        m = 8 + (i % 64)                  # vary shapes
        c = float(i) * 0.5 + 1.0          # vary baked constants

        def f(x, _c=c, _i=i):
            y = x @ (x.T + _c)
            y = jnp.where(y > _i, jnp.sin(y), jnp.sqrt(jnp.abs(y) + _c))
            return jnp.linalg.norm(y) + jnp.sum(jnp.tanh(y[:4, :4]))

        x = jnp.asarray(np.random.default_rng(i).normal(size=(m, m)),
                        jnp.float32)
        v = float(jax.jit(f)(x))
        assert np.isfinite(v)
        if i % 50 == 0:
            print(f"repro[{args.mode}]: {i}/{args.n} ok", flush=True)
    print(f"repro[{args.mode}]: completed {args.n} programs with no crash",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
