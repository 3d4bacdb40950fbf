"""CLI: boot the perception pipeline + web API.

Equivalent of the reference's system entry
(tools/scripts/start_system.sh -> web_backend/server.py): load the YAML
config, build the pipeline, serve /v1/* HTTP.

    python -m lsd_tpu run [--config cfg.yaml] [--port 1234]
    python -m lsd_tpu replay --data <recording_dir> [--slam|--no-slam]
"""
from __future__ import annotations

import argparse
import sys
import time


def cmd_run(args) -> int:
    from .runtime.perception import Perception
    from .web import PerceptionServer

    p = Perception(args.config)
    if args.data:
        cfg = p.get_config()
        cfg["input"]["data_path"] = args.data
        p.config_manager.set_config(cfg)
    p.setup()
    p.start()
    srv = PerceptionServer(p)
    port = srv.start(host=args.host, port=args.port)
    # upgrade daemon on web-port+500 (ref web_ui rpc/http-upgrade.ts PORT)
    from .web import UpgradeServer
    upgrade = UpgradeServer()
    try:
        upgrade.start(host=args.host, port=port + 500)
    except OSError:
        upgrade = None
    print(f"lsd_tpu serving on {args.host}:{port}", flush=True)
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        if upgrade:
            upgrade.stop()
        p.release()
    return 0


def cmd_replay(args) -> int:
    """Headless offline replay through the pipeline (no web server)."""
    from .runtime.config import ConfigManager
    from .runtime.modules import PlayerSource, SinkModule, SlamModule
    from .runtime.pipeline import ModuleManager

    cm = ConfigManager(args.config)
    cm.config.input.data_path = args.data
    chain = ["Source", "SLAM", "Sink"] if args.slam else ["Source", "Sink"]
    cm.config.pipeline = [chain]
    mm = ModuleManager({"Source": PlayerSource, "SLAM": SlamModule,
                        "Sink": SinkModule})
    mm.build(cm.config.pipeline, cm.config)
    mm.start()
    try:
        from .runtime.interface import call_interface, has_interface
        t0 = time.time()
        while time.time() - t0 < args.duration:
            time.sleep(2.0)
            st = mm.get_status()
            src = st["modules"]["Source"]
            line = f"frames={src['frames']}"
            if "SLAM" in st["modules"]:
                line += f" slam_frames={st['modules']['SLAM']['frames']}"
                if has_interface("slam.get_pose"):
                    import numpy as _np
                    p = _np.asarray(call_interface("slam.get_pose"))[:3, 3]
                    line += " pose=[%.2f %.2f %.2f]" % (p[0], p[1], p[2])
            print(line, flush=True)
    finally:
        mm.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(prog="lsd_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run")
    run.add_argument("--config", default=None)
    run.add_argument("--data", default=None)
    run.add_argument("--host", default="0.0.0.0")
    run.add_argument("--port", type=int, default=1234)
    run.set_defaults(fn=cmd_run)

    rep = sub.add_parser("replay")
    rep.add_argument("--config", default=None)
    rep.add_argument("--data", required=True)
    rep.add_argument("--slam", action="store_true")
    rep.add_argument("--duration", type=float, default=10.0)
    rep.set_defaults(fn=cmd_replay)

    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
