"""Golden end-to-end replay: sim recording -> full Perception pipeline
(Source -> SLAM -> Sink) -> trajectory ATE + map save via interfaces.

The integration layer the reference relies on (offline replay as the
universal harness, SURVEY.md section 4), exercised through the real
module pipeline: recorder format, player, frame conversion, SlamModule
threading, interface registry, and map persistence all in one run."""
import os
import time

import numpy as np
import pytest

from lsd_tpu.io.recorder import FrameRecorder
from lsd_tpu.runtime import clear_interfaces
from lsd_tpu.runtime.interface import call_interface
from lsd_tpu.runtime.perception import Perception
from lsd_tpu.sim import CircleSim, SimConfig


def make_recording(tmp_path, n_scans=40):
    sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=n_scans,
                              points_per_scan=4096, seed=33))
    data = sim.generate(capacity=4096, imu_capacity=16)
    rec = FrameRecorder(str(tmp_path / "rec"))
    gts = []
    for k, (P, S, M, I, IM, T_gt) in enumerate(data):
        ts = 1_000_000 + int(k * 1e5)
        n = int(M.sum())
        pts4 = np.concatenate([P[:n], np.zeros((n, 1), np.float32)], axis=1)
        imu_abs = np.asarray(I[: int(IM.sum())], np.float64).copy()
        imu_abs[:, 0] = ts + imu_abs[:, 0] * 1e6
        rec.write(dict(
            frame_start_timestamp=ts,
            frame_timestamp_monotonic=ts,
            points={"0-Custom": pts4},
            points_attr={"0-Custom": dict(
                timestamp=ts,
                points_attr=np.stack([S[:n], np.zeros(n, np.float32)], 1))},
            image={}, image_param={},
            lidar_valid=True, image_valid=False, radar_valid=False,
            ins_valid=False, ins_data={},
            imu_data=imu_abs,
            motion_valid=False, timestep=100000))
        gts.append(T_gt)
    return rec.log_dir, sim, gts


@pytest.mark.slow
def test_full_pipeline_slam_replay(tmp_path):
    clear_interfaces()
    rec_dir, sim, gts = make_recording(tmp_path)
    p = Perception()
    cfg = p.get_config()
    cfg["pipeline"] = [["Source", "SLAM", "Sink"]]
    cfg["input"]["mode"] = "offline"
    cfg["input"]["data_path"] = rec_dir
    cfg["slam"]["mode"] = "mapping"
    cfg["slam"]["resolution"] = 0.4
    cfg["slam"]["key_frames_interval"] = [1.5, 0.3]
    p.config_manager.set_config(cfg)
    p.setup()
    # seed the LIO at the sim's true initial state (the recording has no
    # GNSS; the reference likewise initializes from INS or rest)
    import jax.numpy as jnp
    from lsd_tpu.geometry import so3
    from lsd_tpu.slam.state import init_state
    slam_mod = p.module_manager.modules["SLAM"]
    R, pos = sim.pose(0.0)
    slam_mod.engine.lio_state = slam_mod.engine.lio_state._replace(
        nav=init_state()._replace(
            pos=jnp.asarray(pos, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32)))
    p.start()
    # wait until the whole recording has been integrated
    deadline = time.time() + 300
    eng = slam_mod.engine
    while time.time() < deadline and len(eng.odometry) < len(gts):
        time.sleep(0.5)
    assert len(eng.odometry) >= len(gts) - 1, \
        f"only {len(eng.odometry)}/{len(gts)} scans integrated"

    # trajectory ATE vs sim ground truth
    errs = [np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
            for (_, T_est), T_gt in zip(eng.odometry, gts)]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.30, f"pipeline ATE {ate}"

    # editor surface live through the interface registry
    st = call_interface("slam.get_status")
    assert st["num_keyframes"] >= 5

    # map save through the reference save_mapping flow
    out = call_interface("slam.save_mapping", str(tmp_path / "maps"), "e2e")
    assert out == "ok"
    slam_mod.editor._save_thread.join(timeout=60)
    assert os.path.exists(tmp_path / "maps" / "e2e" / "graph" / "graph.g2o")

    p.release()
    clear_interfaces()
