"""Subprocess runner for the campaign's distributed merge step.

The campaign's LIO sessions run on the real TPU chip (1 device); the
distributed Schur merge needs a mesh, so the campaign invokes this module
in a subprocess on an 8-device virtual CPU mesh (the same environment
dryrun_multichip validates).  Usage:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m lsd_tpu.tools.campaign_merge MAP_A MAP_B OUT_DIR OUT_JSON
"""
from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    map_a, map_b, out_dir, out_json = argv[:4]
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        # persistent compile cache: the Schur GN round's shard_map program
        # dominates merge wall on a cold process (VERDICT r3 #7); with
        # the cache a re-run merge pays solve time only
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from .campaign import merge_distributed
    m = merge_distributed(map_a, map_b, out_dir)
    res = {k: v for k, v in m.items() if k not in ("builder", "info")}
    with open(out_json, "w") as fh:
        json.dump(res, fh)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
