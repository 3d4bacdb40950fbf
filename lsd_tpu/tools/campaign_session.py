"""Run ONE campaign session replay in an isolated process.

The campaign runs each session here (subprocess + hard timeout) so a hung
device transport cannot freeze the whole campaign: the parent kills the
expired child and keeps the sessions that finished (r3: a tunnel wedge at
session B scan 114 froze the original single-process campaign for good).

Usage (internal; invoked by tools/campaign.py):
  python -m lsd_tpu.tools.campaign_session --rec-root RECROOT \
      --map-dir MAP --name A --t-start 0.0 --laps 5.5 --radius 30 \
      --speed 5 --points 16384 --json-out OUT.json
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rec-root", required=True,
                    help="recording root (contains gt.npz + the log dir)")
    ap.add_argument("--map-dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--t-start", type=float, default=0.0)
    ap.add_argument("--laps", type=float, required=True)
    ap.add_argument("--radius", type=float, default=30.0)
    ap.add_argument("--speed", type=float, default=5.0)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--json-out", required=True)
    args = ap.parse_args(argv)

    import numpy as np

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    if jax.default_backend() != "cpu":
        from ..utils.device import keep_session_alive
        keep_session_alive()

    from .campaign import make_sim, run_session

    z = np.load(os.path.join(args.rec_root, "gt.npz"))
    rec = dict(log_dir=str(z["log_dir"]), gt=z["gt"], ts_us=z["ts_us"])
    sim = make_sim(7, args.laps, radius=args.radius, speed=args.speed,
                   points=args.points)
    metrics = run_session(rec, args.map_dir, sim, args.name,
                          t_start=args.t_start,
                          progress=lambda m: print("campaign:", m,
                                                   flush=True))
    with open(args.json_out, "w") as fh:
        json.dump(metrics, fh)
    print("campaign-session:", json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
