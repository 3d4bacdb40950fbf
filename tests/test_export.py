"""Deployment export artifacts (tools/export.py; the reference's
ONNX/TensorRT engine-generation role, pytorch_model/export/)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsd_tpu.models import CenterPointDetector, DetectorConfig
from lsd_tpu.tools.export import ExportedDetector, export_detector

SMALL = DetectorConfig(pc_range=(-48.0, -48.0, -3.0, 48.0, 48.0, 3.0),
                       voxel_size=(1.2, 1.2, 6.0), max_voxels=2048,
                       max_points_per_voxel=8, max_boxes=64)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    model = CenterPointDetector(SMALL)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1024, 4), jnp.float32),
                        jnp.zeros(1024, bool))
    path = export_detector(params, SMALL, point_capacity=4096,
                           out_path=str(tmp_path / "det.hlo"))

    det = ExportedDetector(path)
    assert det.meta["point_capacity"] == 4096
    rng = np.random.default_rng(0)
    pts = (rng.random((4096, 4)) * [60, 60, 4, 1] - [30, 30, 2, 0]).astype(np.float32)
    mask = np.ones(4096, bool)
    out_art = det(pts, mask)

    # the artifact must agree with the live model + decode + postprocess
    from lsd_tpu.detection.post import PostProcessConfig, postprocess
    post_cfg = PostProcessConfig()

    @jax.jit
    def live(p, m):
        preds = model.apply(params, p, m)
        b, s, l, k = model.decode(preds)
        return postprocess(post_cfg, b, s, l, k)

    out_live = live(jnp.asarray(pts), jnp.asarray(mask))
    for a, b in zip(out_art, out_live):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_rejects_bad_magic(tmp_path):
    p = tmp_path / "junk.hlo"
    p.write_bytes(b"NOTANART" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not an lsd_tpu export"):
        ExportedDetector(str(p))
