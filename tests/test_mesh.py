"""Textured-mesh export (ref slam/src/graph_utils.cpp:449 texture_mesh)."""
import numpy as np
import pytest

from lsd_tpu.slam.mesh import (knn_mean_colors, read_obj, read_ply_mesh,
                               texture_mesh, write_ply_mesh)


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("# comment\n"
                 "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                 "f 1 2 3\nf 2/1 4/2 3/3\nf -4 -3 -2\n")
    verts, faces = read_obj(str(p))
    assert verts.shape == (4, 3)
    assert faces == [(0, 1, 2), (1, 3, 2), (0, 1, 2)]


def test_ply_roundtrip(tmp_path):
    verts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    colors = np.random.default_rng(1).integers(0, 255, (10, 3)).astype(np.uint8)
    faces = [(0, 1, 2), (3, 4, 5, 6)]
    path = write_ply_mesh(str(tmp_path / "m.ply"), verts, colors, faces)
    v2, c2, f2 = read_ply_mesh(path)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(c2[:, :3], colors)
    assert c2[:, 3].min() == 255
    assert f2 == faces


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(2)
    cloud = rng.normal(size=(700, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (700, 3)).astype(np.float32)
    q = rng.normal(size=(37, 3)).astype(np.float32)
    got = knn_mean_colors(cloud, rgb, q, k=3, q_chunk=16, c_chunk=128)
    _, idx = cKDTree(cloud).query(q, k=3)
    want = rgb[idx].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_texture_mesh_colors_from_nearest_cluster(tmp_path):
    # two colored clusters; mesh vertices sit on top of each
    from lsd_tpu.io.pcd import write_pcd
    rng = np.random.default_rng(3)
    red = np.concatenate([rng.normal(0, 0.05, (200, 3)) + [0, 0, 0],
                          np.tile([1.0, 0.0, 0.0], (200, 1))], axis=1)
    blue = np.concatenate([rng.normal(0, 0.05, (200, 3)) + [10, 0, 0],
                           np.tile([0.0, 0.0, 1.0], (200, 1))], axis=1)
    cloud = np.concatenate([red, blue]).astype(np.float32)
    pcd = tmp_path / "map.pcd"
    write_pcd(str(pcd), cloud, fields=("x", "y", "z", "r", "g", "b"))

    obj = tmp_path / "mesh.obj"
    obj.write_text("v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\n"
                   "v 10 0 0\nv 10.1 0 0\nv 10 0.1 0\n"
                   "f 1 2 3\nf 4 5 6\n")
    out = texture_mesh(str(obj), str(pcd), str(tmp_path / "out"))
    assert out.endswith("texture_mesh.ply")
    v, c, f = read_ply_mesh(out)
    assert len(v) == 6 and len(f) == 2
    assert (c[:3, 0] > 200).all() and (c[:3, 2] < 50).all()   # red end
    assert (c[3:, 2] > 200).all() and (c[3:, 0] < 50).all()   # blue end


def test_packed_rgb_and_intensity_fallback(tmp_path):
    from lsd_tpu.io.pcd import write_pcd
    from lsd_tpu.slam.mesh import _cloud_colors

    packed = np.asarray([(200 << 16) | (100 << 8) | 50], np.uint32)
    arr = np.concatenate([np.zeros((1, 3), np.float32),
                          packed.view(np.float32)[:, None]], axis=1)
    rgb = _cloud_colors(arr, ["x", "y", "z", "rgb"])
    np.testing.assert_allclose(rgb[0], [200, 100, 50])

    arr2 = np.asarray([[0, 0, 0, 0.5]], np.float32)
    gray = _cloud_colors(arr2, ["x", "y", "z", "intensity"])
    np.testing.assert_allclose(gray[0], [127.5] * 3)


def test_interface_registered():
    """slam.texture_mesh must be exposed like the reference's
    slam_wrapper.cpp:307 pybind surface."""
    from lsd_tpu.runtime.interface import clear_interfaces, has_interface
    from lsd_tpu.runtime.modules import register_static_slam_tools

    clear_interfaces()
    register_static_slam_tools()
    assert has_interface("slam.texture_mesh")
    clear_interfaces()
