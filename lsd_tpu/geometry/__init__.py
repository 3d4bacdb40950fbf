from . import so3, se3, utm
from .so3 import (
    hat, vee, exp_so3, log_so3, left_jacobian, inv_left_jacobian,
    quat_mul, quat_conj, quat_normalize, quat_to_matrix, matrix_to_quat,
    quat_from_rotvec, quat_rotate, quat_slerp, rpy_to_matrix, matrix_to_rpy,
)
from .se3 import (
    exp_se3, log_se3, compose, inverse, transform_points, make_pose,
    pose_interp, relative_pose,
)
from .utm import latlon_to_utm, utm_to_latlon
