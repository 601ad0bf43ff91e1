"""Conversions (parity: reference `mppiisaac/utils/conversions.py:4-11`)."""
from ..physics.math3d import (  # noqa: F401
    quat_to_yaw as quaternion_to_yaw,
    quat_to_euler_zyx,
    quat_to_matrix as quaternion_to_matrix,
    matrix_to_quat as matrix_to_quaternion,
)
