import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.geometry import so3, se3, utm


def rand_rotvec(key, n=16, scale=2.5):
    return scale * jax.random.normal(key, (n, 3))


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(0))
        R = so3.exp_so3(w)
        w2 = so3.log_so3(R)
        R2 = so3.exp_so3(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)

    def test_exp_is_rotation(self):
        w = rand_rotvec(jax.random.PRNGKey(1))
        R = so3.exp_so3(w)
        I = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(I), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        R = so3.exp_so3(w)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(so3.log_so3(R))))

    def test_near_pi(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        w = (np.pi - 1e-4) * axis
        R = so3.exp_so3(w)
        w2 = so3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)

    def test_quat_matrix_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(2))
        R = so3.exp_so3(w)
        q = so3.matrix_to_quat(R)
        R2 = so3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(3)
        w = rand_rotvec(key, 8)
        v = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
        R = so3.exp_so3(w)
        q = so3.matrix_to_quat(R)
        np.testing.assert_allclose(
            np.asarray(so3.quat_rotate(q, v)), np.asarray((R @ v[..., None])[..., 0]), atol=1e-5)

    def test_quat_mul_matches_matmul(self):
        wa = rand_rotvec(jax.random.PRNGKey(5), 8)
        wb = rand_rotvec(jax.random.PRNGKey(6), 8)
        qa, qb = so3.quat_from_rotvec(wa), so3.quat_from_rotvec(wb)
        np.testing.assert_allclose(
            np.asarray(so3.quat_to_matrix(so3.quat_mul(qa, qb))),
            np.asarray(so3.exp_so3(wa) @ so3.exp_so3(wb)), atol=1e-5)

    def test_left_jacobian_inverse(self):
        w = rand_rotvec(jax.random.PRNGKey(7), 8, scale=1.5)
        J = so3.left_jacobian(w)
        Jinv = so3.inv_left_jacobian(w)
        I = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(np.asarray(J @ Jinv), np.asarray(I), atol=1e-4)

    def test_rpy_roundtrip(self):
        rpy = jnp.array([[0.1, -0.3, 2.0], [0.0, 0.0, 0.0], [-1.0, 0.5, -3.0]])
        R = so3.rpy_to_matrix(rpy)
        rpy2 = so3.matrix_to_rpy(R)
        np.testing.assert_allclose(np.asarray(rpy), np.asarray(rpy2), atol=1e-5)

    def test_rpy_convention_zyx(self):
        # yaw-only rotation about z
        R = so3.rpy_to_matrix(jnp.array([0.0, 0.0, np.pi / 2]))
        v = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(R @ v), [0.0, 1.0, 0.0], atol=1e-6)

    def test_slerp_endpoints_midpoint(self):
        q0 = so3.quat_from_rotvec(jnp.array([0.0, 0.0, 0.0]))
        q1 = so3.quat_from_rotvec(jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(so3.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(so3.quat_slerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-6)
        qm = so3.quat_slerp(q0, q1, 0.5)
        np.testing.assert_allclose(np.asarray(so3.rotvec_from_quat(qm)), [0, 0, 0.5], atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(0), (16, 6))
        T = se3.exp_se3(xi)
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
        T = se3.exp_se3(xi)
        I = jnp.broadcast_to(jnp.eye(4), T.shape)
        np.testing.assert_allclose(np.asarray(T @ se3.inverse(T)), np.asarray(I), atol=1e-5)

    def test_transform_points(self):
        T = se3.exp_se3(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2]))
        pts = jnp.array([[1.0, 0.0, 0.0]])
        out = se3.transform_points(T, pts)
        hom = T @ jnp.array([1.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(hom[:3]), atol=1e-5)

    def test_relative_pose(self):
        Ta = se3.exp_se3(jax.random.normal(jax.random.PRNGKey(2), (6,)))
        Tb = se3.exp_se3(jax.random.normal(jax.random.PRNGKey(3), (6,)))
        Tab = se3.relative_pose(Ta, Tb)
        np.testing.assert_allclose(np.asarray(Ta @ Tab), np.asarray(Tb), atol=1e-5)

    def test_pose_interp(self):
        T0 = jnp.eye(4)
        T1 = se3.make_pose(so3.exp_so3(jnp.array([0.0, 0.0, 1.0])), jnp.array([2.0, 0.0, 0.0]))
        Tm = se3.pose_interp(T0, T1, 0.5)
        np.testing.assert_allclose(np.asarray(Tm[:3, 3]), [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(so3.log_so3(Tm[:3, :3])), [0, 0, 0.5], atol=1e-5)


class TestUTM:
    def test_roundtrip(self):
        lat = np.array([42.293195, 31.23, -33.865])   # NCLT, Shanghai, Sydney
        lon = np.array([-83.709657, 121.47, 151.209])
        for la, lo in zip(lat, lon):
            e, n, zone = utm.latlon_to_utm(la, lo)
            la2, lo2 = utm.utm_to_latlon(e, n, zone)
            np.testing.assert_allclose([la2, lo2], [la, lo], atol=1e-9)

    def test_known_point(self):
        # Ann Arbor (NCLT area), zone 17T — cross-checked against an
        # independent Snyder-series implementation (agreement < 1 mm).
        e, n, zone = utm.latlon_to_utm(42.293195, -83.709657)
        assert zone == 17
        assert abs(e - 276617.741) < 0.01
        assert abs(n - 4685886.048) < 0.01

    def test_local_metric_scale(self):
        # 1e-5 deg latitude ~ 1.11 m northing
        e0, n0, z = utm.latlon_to_utm(42.0, -83.0)
        e1, n1, _ = utm.latlon_to_utm(42.00001, -83.0, z)
        assert abs((n1 - n0) - 1.11) < 0.01

    def test_projector_anchoring(self):
        proj = utm.UTMProjector()
        x0, y0 = proj.project(42.0, -83.0)
        assert abs(x0) < 1e-9 and abs(y0) < 1e-9
        x1, y1 = proj.project(42.00001, -83.0)
        assert abs(y1 - 1.11) < 0.01
        la, lo = proj.unproject(x1, y1)
        np.testing.assert_allclose([la, lo], [42.00001, -83.0], atol=1e-9)
