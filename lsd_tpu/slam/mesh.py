"""Textured-mesh export.

Parity with the reference's ``texture_mesh`` (slam/src/graph_utils.cpp:449,
exposed at slam_wrapper.cpp:307): colour the vertices of a reconstruction
mesh (OBJ, e.g. from Poisson/marching-cubes tooling) by averaging the k=3
nearest neighbours in the RGB map cloud, then save ``texture_mesh.ply``.

The reference walks a FLANN KD-tree per vertex on the CPU; here the kNN is
a chunked brute-force that maps onto the MXU — squared distances computed
as one matmul per (query-chunk x cloud-chunk) tile, with a running top-k
merge carried through a ``lax.scan`` over cloud tiles.  Static shapes, f32
accumulation, no tree build.
"""
from __future__ import annotations

import os
import struct
from typing import List, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# OBJ / PLY io
# ---------------------------------------------------------------------------

def read_obj(path: str) -> Tuple[np.ndarray, List[Tuple[int, ...]]]:
    """Parse a Wavefront OBJ -> (vertices (N, 3) f32, faces as 0-based tuples).

    Handles ``v x y z [r g b]`` and ``f a b c ...`` with ``a/b/c`` index
    syntax and negative (relative) indices.
    """
    verts: List[Tuple[float, float, float]] = []
    faces: List[Tuple[int, ...]] = []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v" and len(tok) >= 4:
                verts.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "f" and len(tok) >= 4:
                idx = []
                for t in tok[1:]:
                    i = int(t.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                faces.append(tuple(idx))
    return np.asarray(verts, np.float32).reshape(-1, 3), faces


def write_ply_mesh(path: str, vertices: np.ndarray, colors_u8: np.ndarray,
                   faces: Sequence[Tuple[int, ...]]) -> str:
    """Binary little-endian PLY with per-vertex RGBA (the reference's
    savePLYFileBinary output shape: xyz + rgba vertices + faces)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    c = np.asarray(colors_u8, np.uint8).reshape(-1, 4 if
                                                np.asarray(colors_u8).shape[-1] == 4 else 3)
    if c.shape[1] == 3:
        c = np.concatenate([c, np.full((len(c), 1), 255, np.uint8)], axis=1)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(v)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n")
    rec = np.zeros(len(v), dtype=np.dtype([("xyz", np.float32, (3,)),
                                           ("rgba", np.uint8, (4,))]))
    rec["xyz"] = v
    rec["rgba"] = c
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
        for face in faces:
            f.write(struct.pack("<B", len(face)))
            f.write(struct.pack(f"<{len(face)}i", *face))
    return path


def read_ply_mesh(path: str) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, ...]]]:
    """Read back a PLY written by :func:`write_ply_mesh`
    -> (vertices (N, 3), rgba (N, 4) u8, faces)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply"
        n_v = n_f = 0
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith(b"element face"):
                n_f = int(line.split()[-1])
            elif line == b"end_header":
                break
        rec = np.dtype([("xyz", np.float32, (3,)), ("rgba", np.uint8, (4,))])
        data = np.frombuffer(f.read(n_v * rec.itemsize), dtype=rec, count=n_v)
        faces = []
        for _ in range(n_f):
            (n,) = struct.unpack("<B", f.read(1))
            faces.append(struct.unpack(f"<{n}i", f.read(4 * n)))
    return data["xyz"].copy(), data["rgba"].copy(), faces


# ---------------------------------------------------------------------------
# kNN colour transfer
# ---------------------------------------------------------------------------

def knn_mean_colors(cloud_xyz: np.ndarray, cloud_rgb: np.ndarray,
                    query_xyz: np.ndarray, k: int = 3,
                    q_chunk: int = 1024, c_chunk: int = 65536) -> np.ndarray:
    """Mean colour of each query's k nearest cloud points.

    Brute-force on-device: for each query tile, scan cloud tiles computing
    d2 = |q|^2 + |c|^2 - 2 q.c^T (one (q_chunk, 3) x (3, c_chunk) matmul on
    the MXU), keep a running per-query top-k of (distance, colour) merged
    with ``lax.top_k``.  Returns (Q, 3) float colours in the cloud_rgb range.
    """
    import jax
    import jax.numpy as jnp

    cloud_xyz = np.asarray(cloud_xyz, np.float32).reshape(-1, 3)
    cloud_rgb = np.asarray(cloud_rgb, np.float32).reshape(len(cloud_xyz), -1)[:, :3]
    query_xyz = np.asarray(query_xyz, np.float32).reshape(-1, 3)
    n_q, n_c = len(query_xyz), len(cloud_xyz)
    if n_c == 0 or n_q == 0:
        return np.zeros((n_q, 3), np.float32)
    k = min(k, n_c)

    c_chunk = min(c_chunk, max(128, 1 << int(np.ceil(np.log2(n_c)))))
    n_tiles = -(-n_c // c_chunk)
    pad_c = n_tiles * c_chunk - n_c
    # padded points sit far away so they never enter a top-k
    cx = np.concatenate([cloud_xyz, np.full((pad_c, 3), 1e7, np.float32)])
    cc = np.concatenate([cloud_rgb, np.zeros((pad_c, 3), np.float32)])
    cx = cx.reshape(n_tiles, c_chunk, 3)
    cc = cc.reshape(n_tiles, c_chunk, 3)

    @jax.jit
    def tile_knn(q, cx, cc):
        qn = jnp.sum(q * q, axis=1, keepdims=True)

        def step(carry, tile):
            best_d2, best_rgb = carry
            tx, trgb = tile
            d2 = qn + jnp.sum(tx * tx, axis=1)[None, :] - 2.0 * (q @ tx.T)
            nd2, idx = jax.lax.top_k(-d2, k)
            cand = jnp.concatenate([best_d2, -nd2], axis=1)
            cand_rgb = jnp.concatenate([best_rgb, trgb[idx]], axis=1)
            md2, mi = jax.lax.top_k(-cand, k)
            mrgb = jnp.take_along_axis(cand_rgb, mi[..., None], axis=1)
            return (-md2, mrgb), None

        init = (jnp.full((q.shape[0], k), jnp.inf, jnp.float32),
                jnp.zeros((q.shape[0], k, 3), jnp.float32))
        (d2, rgb), _ = jax.lax.scan(step, init, (cx, cc))
        return jnp.mean(rgb, axis=1)

    out = np.zeros((n_q, 3), np.float32)
    cx_d, cc_d = jnp.asarray(cx), jnp.asarray(cc)
    q_chunk = min(q_chunk, max(8, n_q))
    for s in range(0, n_q, q_chunk):
        q = query_xyz[s:s + q_chunk]
        pad_q = q_chunk - len(q)
        if pad_q:
            q = np.concatenate([q, np.zeros((pad_q, 3), np.float32)])
        res = np.asarray(tile_knn(jnp.asarray(q), cx_d, cc_d))
        out[s:s + q_chunk] = res[:q_chunk - pad_q] if pad_q else res
    return out


# ---------------------------------------------------------------------------
# texture_mesh entry (the slam_wrapper.cpp:307 surface)
# ---------------------------------------------------------------------------

def _cloud_colors(arr: np.ndarray, names: List[str]) -> np.ndarray:
    """Extract per-point RGB in [0, 255] from a PCD column layout: split
    r/g/b fields, PCL packed-float ``rgb``, or intensity-as-gray fallback."""
    cols = {n: i for i, n in enumerate(names)}
    if all(c in cols for c in ("r", "g", "b")):
        rgb = arr[:, [cols["r"], cols["g"], cols["b"]]]
        return rgb * 255.0 if rgb.max(initial=0.0) <= 1.0 + 1e-6 else rgb
    if "rgb" in cols:
        packed = arr[:, cols["rgb"]].astype(np.float32).view(np.uint32)
        return np.stack([(packed >> 16) & 0xFF, (packed >> 8) & 0xFF,
                         packed & 0xFF], axis=-1).astype(np.float32)
    if "intensity" in cols:
        i = arr[:, cols["intensity"]]
        i = i * 255.0 if i.max(initial=0.0) <= 1.0 + 1e-6 else i
        return np.repeat(np.clip(i, 0, 255)[:, None], 3, axis=1)
    return np.full((len(arr), 3), 128.0, np.float32)


def texture_mesh(mesh_path: str, cloud_path: str, output_path: str,
                 k: int = 3) -> str:
    """Colour ``mesh_path`` (OBJ) vertices from the RGB map cloud at
    ``cloud_path`` (PCD) and write ``output_path/texture_mesh.ply``
    (ref graph_utils.cpp:449-501, smooth_factor=3)."""
    from ..io.pcd import read_pcd_fields

    verts, faces = read_obj(mesh_path)
    arr, names = read_pcd_fields(cloud_path)
    cols = {n: i for i, n in enumerate(names)}
    xyz = arr[:, [cols.get("x", 0), cols.get("y", 1), cols.get("z", 2)]]
    rgb = _cloud_colors(arr, names)
    vcol = knn_mean_colors(xyz, rgb, verts, k=k)
    os.makedirs(output_path, exist_ok=True)
    out = os.path.join(output_path, "texture_mesh.ply")
    return write_ply_mesh(out, verts,
                          np.clip(vcol + 0.5, 0, 255).astype(np.uint8), faces)
