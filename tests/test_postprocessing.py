"""CLI parity tests for tools/postprocessing (ref
tools/postprocessing/{accumulate_cloud,convert_map_pose}.py)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_map_and_rec(tmp_path_factory):
    import jax.numpy as jnp
    from lsd_tpu.io.recorder import FrameRecorder
    from lsd_tpu.slam.map_io import save_map

    root = tmp_path_factory.mktemp("pp")
    rng = np.random.default_rng(3)
    rec = FrameRecorder(str(root / "rec"))
    stamps, poses, clouds = [], [], []
    for k in range(8):
        ts = 1_000_000 + k * 100_000
        pts = rng.uniform(-5, 5, (500, 4)).astype(np.float32)
        pts[:, 2] = np.abs(pts[:, 2])
        rec.write(dict(
            frame_start_timestamp=ts, frame_timestamp_monotonic=ts,
            points={"0-Custom": pts},
            points_attr={"0-Custom": dict(
                timestamp=ts, points_attr=np.zeros((500, 2), np.float32))},
            image={}, image_param={}, lidar_valid=True, image_valid=False,
            radar_valid=False, ins_valid=False, ins_data={},
            imu_data=np.asarray([[ts, 0, 0, 0, 0, 0, 1.0]], np.float64),
            motion_valid=False, timestep=100000))
        T = np.eye(4)
        T[0, 3] = 2.0 * k
        stamps.append(ts)
        poses.append(T)
        clouds.append(pts)
    map_dir = str(root / "map")
    save_map(map_dir, np.zeros(3), stamps, poses, clouds,
             edges=[], fixed=[0])
    return rec.log_dir, map_dir, str(root)


def test_convert_map_pose_tum(small_map_and_rec):
    from lsd_tpu.tools.postprocessing import convert_map_pose
    _rec, map_dir, root = small_map_and_rec
    out = convert_map_pose(map_dir, os.path.join(root, "traj.txt"))
    rows = np.loadtxt(out)
    assert rows.shape == (8, 8)
    # timestamps in seconds ascending; x advances 2 m per keyframe
    assert np.all(np.diff(rows[:, 0]) > 0)
    np.testing.assert_allclose(np.diff(rows[:, 1]), 2.0, atol=1e-5)
    # identity quaternion xyzw
    np.testing.assert_allclose(rows[0, 4:], [0, 0, 0, 1], atol=1e-6)


def test_accumulate_cloud(small_map_and_rec):
    from lsd_tpu.io.pcd import read_pcd
    from lsd_tpu.tools.postprocessing import accumulate_cloud
    rec_dir, map_dir, root = small_map_and_rec
    out = accumulate_cloud(rec_dir, map_dir,
                           os.path.join(root, "acc.pcd"), resolution=0.0,
                           z_min=-10.0, z_max=10.0)
    cloud = read_pcd(out)
    # frames after the first keyframe stamp contribute (7 of 8)
    assert len(cloud) == 7 * 500
    # transformed x range includes the trajectory extent
    assert cloud[:, 0].max() > 8.0
    # downsampled variant is smaller
    out2 = accumulate_cloud(rec_dir, map_dir,
                            os.path.join(root, "acc2.pcd"), resolution=1.0,
                            z_min=-10.0, z_max=10.0)
    assert 0 < len(read_pcd(out2)) < len(cloud)
