"""odom2map correction broadcast (ref hdl_graph_slam_nodelet.cpp:600-651):
after a graph optimization, the PUBLISHED pose — not just the stored
keyframes — must carry the loop-closure correction."""
import numpy as np

from lsd_tpu.slam.mapper import Mapper, MapperConfig
from lsd_tpu.slam.keyframe import Keyframe


def _pose(x, y, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = x, y
    return T


def _fabricate(m: Mapper, odom: np.ndarray) -> int:
    """Insert a keyframe the way _add_keyframe does, minus clouds/SC."""
    pose = m.odom2map @ odom
    kf = Keyframe(id=-1, stamp_us=len(m.store) * 100000, pose=pose.copy(),
                  odom=odom.copy(), cloud=np.zeros((0, 4), np.float32))
    kid = m.store.add(kf)
    m.graph.add_node(pose, fixed=(kid == 0))
    if kid > 0:
        prev = m.store[kid - 1]
        T_rel = np.linalg.inv(prev.odom) @ kf.odom
        m.graph.add_se3_edge(kid - 1, kid, T_rel, rot_info=400.0,
                             trans_info=400.0)
    return kid


DRIFT = 0.1   # lateral odometry drift per keyframe (m)


def _build_loop_graph(n=8):
    """Odometry drifts +0.1 m/kf in y; a loop edge carrying the true
    relative transform (pure x translation) exposes the drift."""
    m = Mapper(MapperConfig())
    for k in range(n):
        _fabricate(m, _pose(2.0 * k, DRIFT * k))
    T_rel = np.eye(4)
    T_rel[0, 3] = 2.0 * (n - 1)
    m.graph.add_se3_edge(0, n - 1, T_rel, rot_info=400.0, trans_info=400.0)
    return m, n


def test_optimize_updates_odom2map_and_published_pose():
    m, n = _build_loop_graph()
    assert np.allclose(m.odom2map, np.eye(4))
    y_before = m.store[n - 1].pose[1, 3]          # 0.7 m of drift
    m.optimize_graph()
    y_after = m.store[n - 1].pose[1, 3]
    # the loop visibly snapped the last keyframe back onto the true line
    assert abs(y_after) < 0.05 < abs(y_before)
    # and the correction transform is now broadcast
    corr = m.odom2map
    assert not np.allclose(corr, np.eye(4), atol=1e-4)
    expect = m.store[n - 1].pose @ np.linalg.inv(m.store[n - 1].odom)
    assert np.allclose(corr, expect, atol=1e-9)

    # the live published pose composes the correction: raw odometry
    # continuing the drift is snapped by the same correction
    odom_next = _pose(2.0 * n, DRIFT * n)
    published = m.odom2map @ odom_next
    assert abs(published[1, 3]) < abs(odom_next[1, 3]) - 0.3

    # get_timed_pose is map-frame too
    m._track = dict(stamp_us=0, t=np.array([0.0]),
                    quat=np.array([[1.0, 0, 0, 0]]),
                    pos=odom_next[:3, 3][None], vel=np.zeros(3),
                    end_pose=odom_next)
    T = m.get_timed_pose(0)
    assert abs(T[1, 3] - published[1, 3]) < 1e-6


def test_new_keyframes_enter_graph_in_map_frame():
    m, n = _build_loop_graph()
    m.optimize_graph()
    corr = m.odom2map.copy()
    assert not np.allclose(corr, np.eye(4), atol=1e-4)
    odom_next = _pose(2.0 * n, DRIFT * n)
    kid = _fabricate(m, odom_next)
    # the stored pose and graph node are odom2map-composed
    assert np.allclose(m.store[kid].pose, corr @ odom_next, atol=1e-9)
    assert np.allclose(m.graph.node_pose(kid), m.store[kid].pose, atol=1e-6)


def test_solve_runs_outside_lock_and_reconciles_appends():
    """optimize_graph snapshots under the lock, solves unlocked, and
    re-anchors nodes appended mid-solve through the refreshed odom2map
    (VERDICT r4 #4: the locked solve pinned odometry during PGO bursts)."""
    import lsd_tpu.slam.mapper as mapper_mod
    m, n = _build_loop_graph()
    appended = {}
    real_optimize = mapper_mod.optimize

    def optimize_with_append(data, cfg):
        # simulate the odometry thread appending a keyframe while the
        # solve is in flight (lock must NOT be held here: _fabricate's
        # graph ops would deadlock if optimize_graph still held it on
        # this same thread path... RLock hides that, so assert instead)
        assert not appended, "optimize entered twice"
        odom_next = _pose(2.0 * n, DRIFT * n)
        appended["kid"] = _fabricate(m, odom_next)
        appended["odom"] = odom_next
        return real_optimize(data, cfg)

    mapper_mod.optimize = optimize_with_append
    try:
        m.optimize_graph()
    finally:
        mapper_mod.optimize = real_optimize
    corr = m.odom2map
    assert not np.allclose(corr, np.eye(4), atol=1e-4)
    kid = appended["kid"]
    # the mid-solve keyframe was re-anchored onto the refreshed correction
    assert np.allclose(m.store[kid].pose, corr @ appended["odom"],
                       atol=1e-6)
    assert np.allclose(m.graph.node_pose(kid), m.store[kid].pose,
                       atol=1e-5)
    # and the snapshot nodes still got the optimized writeback
    assert abs(m.store[n - 1].pose[1, 3]) < 0.05


def test_structural_edit_mid_solve_discards_writeback():
    """A del-vertex style renumbering during an unlocked solve must
    discard the stale result instead of writing poses onto shifted ids."""
    import lsd_tpu.slam.mapper as mapper_mod
    m, n = _build_loop_graph()
    real_optimize = mapper_mod.optimize

    def optimize_with_struct_edit(data, cfg):
        m._graph_struct_version += 1     # what editor del_vertex does
        return real_optimize(data, cfg)

    poses_before = [m.store[i].pose.copy() for i in range(n)]
    mapper_mod.optimize = optimize_with_struct_edit
    try:
        m.optimize_graph()
    finally:
        mapper_mod.optimize = real_optimize
    for i in range(n):          # nothing written back, odom2map untouched
        assert np.allclose(m.store[i].pose, poses_before[i])
    assert np.allclose(m.odom2map, np.eye(4))
