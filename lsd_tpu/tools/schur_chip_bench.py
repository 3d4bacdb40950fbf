"""Measure the Schur merge's per-round device kernel on the REAL chip
(VERDICT r4 #6).

The campaign's distributed merge (parallel/schur_pgo.py) was only ever
timed on the 8-process virtual CPU mesh, where a GN round costs seconds
of *emulation*; the claim that it is fast on real hardware rested on
arithmetic.  This tool times the per-device round body — dense interior
Cholesky elimination + separator reduction + back-substitution, the
~900x900 block algebra at merge shapes — on one real TPU:

  * a merge-shaped synthetic graph is built at the campaign's recorded
    scale (default: 1192 nodes / 432 loop+cross edges / 1173 GNSS
    priors, CAMPAIGN_r04.json merged_full);
  * the 8-device partition plan fixes the per-device shapes
    (m_int interiors, n_sep separators, E_loc local factors);
  * the IDENTICAL shard_map round program runs on a 1-device mesh fed
    device 0's slice of that plan.  psum over one device is the
    identity, and the separator solve is replicated on every device in
    the real topology, so per-device FLOPs and shapes match the 8-chip
    case exactly; only the ICI reduction is absent;
  * the psum payload is one (S*6)^2 + (S*6) f32 block per round — its
    ICI cost is reported as bytes so the projection states its
    assumption instead of hiding it.

Timing follows the axon integrity rule (skills/verify): one device_get
FIRST (switches the tunnel session to synchronous dispatch), then every
round is fenced by fetching a small output.

    python -m lsd_tpu.tools.schur_chip_bench [--nodes 1192] [--ndev 8]
"""
from __future__ import annotations

import argparse
import json
import time


def build_merge_shaped_graph(n_nodes: int, n_loops: int, n_gps: int,
                             seed: int = 0):
    """Campaign-shaped pose graph: two odometry chains (sessions A+B)
    around a circle, loop/cross edges between revisits, GNSS priors."""
    import numpy as np

    from ..slam.graph_builder import PoseGraphBuilder

    rng = np.random.default_rng(seed)
    g = PoseGraphBuilder()
    R = 30.0
    for i in range(n_nodes):
        th = 2 * np.pi * (i / 220.0)          # ~220 nodes per lap
        T = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        T[:2, :2] = [[c, -s], [s, c]]
        T[0, 3] = R * np.cos(th) + rng.normal(0, 0.05)
        T[1, 3] = R * np.sin(th) + rng.normal(0, 0.05)
        g.add_node(T, fixed=(i == 0))
        if i > 0:
            T_rel = np.linalg.inv(g.node_pose(i - 1)) @ g.node_pose(i)
            g.add_se3_edge(i - 1, i, T_rel, rot_info=4e4, trans_info=4e4)
    lap = 220
    for _ in range(n_loops):
        i = int(rng.integers(0, max(n_nodes - lap, 1)))
        j = min(i + lap, n_nodes - 1)          # revisit one lap later
        T_rel = np.linalg.inv(g.node_pose(i)) @ g.node_pose(j)
        info = rng.uniform(1.0, 400.0, size=3)
        g.add_se3_edge(i, j, T_rel, rot_info=info, trans_info=info)
    for i in rng.choice(n_nodes, size=min(n_gps, n_nodes), replace=False):
        g.add_gps_prior(int(i), g.node_pose(int(i))[:3, 3]
                        + rng.normal(0, 0.02, 3), xy_only=True, info=25.0)
    return g


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nodes", type=int, default=1192)
    ap.add_argument("--loops", type=int, default=432)
    ap.add_argument("--gps", type=int, default=1173)
    ap.add_argument("--ndev", type=int, default=8,
                    help="plan topology whose per-device shapes to time")
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--outer-iters", type=int, default=8,
                    help="campaign merge GN rounds (projection)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--maps", nargs=2, default=None, metavar=("A", "B"),
                    help="time the REAL campaign merge graph (two saved "
                         "map dirs, joint graph via slam.map_merge) "
                         "instead of the synthetic stand-in")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ..parallel.schur_pgo import _build_round, build_plan
    from ..slam.posegraph import PgoConfig

    # axon timing integrity: enter synchronous-dispatch mode first
    jax.device_get(jnp.zeros(1))

    if args.maps:
        from ..slam.map_merge import merge_maps
        builder = merge_maps(args.maps[0], args.maps[1],
                             out_dir=None)["builder"]
    else:
        builder = build_merge_shaped_graph(args.nodes, args.loops,
                                           args.gps)
    graph = builder.to_data()
    n = graph.nodes.quat.shape[0]
    plan = build_plan(graph, args.ndev)
    cfg = PgoConfig(outer_iters=args.outer_iters, cg_iters=80)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    rnd = _build_round(mesh1, cfg, plan.m_int, plan.n_sep,
                       plan.e_rows.shape[1], plan.g_rows.shape[1],
                       plan.f_rows.shape[1], plan.o_rows.shape[1], n)

    J = jnp.asarray
    dev0 = (J(plan.int_ids[:1].astype(np.int32)), J(plan.int_mask[:1]),
            J(plan.sep_ids.astype(np.int32)), J(plan.sep_mask),
            J(plan.e_rows[:1].astype(np.int32)),
            J(plan.e_slots[:1].astype(np.int32)), J(plan.e_mask[:1]),
            J(plan.g_rows[:1].astype(np.int32)),
            J(plan.g_slots[:1].astype(np.int32)), J(plan.g_mask[:1]),
            J(plan.f_rows[:1].astype(np.int32)),
            J(plan.f_slots[:1].astype(np.int32)), J(plan.f_mask[:1]),
            J(plan.o_rows[:1].astype(np.int32)),
            J(plan.o_slots[:1].astype(np.int32)), J(plan.o_mask[:1]))
    free = (graph.nodes.mask & ~graph.nodes.fixed).astype(jnp.float32)
    nodes, gps_on = graph.nodes, jnp.ones_like(graph.gps.mask)

    t0 = time.perf_counter()
    nodes1, gps_on1 = rnd(nodes, gps_on, free, *dev0,
                          graph.se3, graph.gps, graph.floor, graph.orient)
    jax.device_get(nodes1.pos[:1])
    compile_plus_first_s = time.perf_counter() - t0

    times = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        nodes, gps_on = rnd(nodes, gps_on, free, *dev0,
                            graph.se3, graph.gps, graph.floor, graph.orient)
        jax.device_get(nodes.pos[:1])
        times.append(time.perf_counter() - t0)
    assert bool(jnp.all(jnp.isfinite(nodes.pos))), "round produced NaNs"

    round_ms = 1e3 * float(np.median(times))
    sep_dim = plan.n_sep * 6
    psum_bytes = 4 * (sep_dim * sep_dim + sep_dim)
    # ICI projection: one S-block all-reduce per round.  At the public
    # v5e all-reduce order-of-magnitude (~1e11 B/s per link), this
    # payload is sub-millisecond; the stated wall uses 100 GB/s and the
    # bytes are recorded so any other assumption can be substituted.
    ici_ms = 1e3 * psum_bytes / 100e9
    proj_wall_s = compile_plus_first_s + (args.outer_iters - 1) * (
        round_ms + ici_ms) / 1e3
    out = dict(
        platform=jax.devices()[0].platform,
        device=str(jax.devices()[0]),
        n_nodes=int(n), ndev_plan=args.ndev,
        m_int=int(plan.m_int), n_sep=int(plan.n_sep),
        interior_dim=int(plan.m_int * 6), sep_dim=int(sep_dim),
        compile_plus_first_round_s=round(compile_plus_first_s, 3),
        round_ms_median=round(round_ms, 3),
        round_ms_min=round(1e3 * float(np.min(times)), 3),
        psum_bytes_per_round=int(psum_bytes),
        ici_est_ms_at_100GBps=round(ici_ms, 4),
        projected_merge_wall_s={"outer_iters": args.outer_iters,
                                "wall_s": round(proj_wall_s, 3)},
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
