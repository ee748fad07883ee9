from .rotations import (
    q_to_rot_mat,
    v_dot_q,
    q_dot_q,
    quaternion_inverse,
    unit_quat,
    skew_symmetric4,
    quaternion_derivative,
    euler_to_quaternion,
    quaternion_to_euler,
    undo_quaternion_flip,
    decompose_quaternion,
    rotation_matrix_to_quat,
    rotation_matrix_to_euler,
)
from .reference import get_reference_chunk, reference_gather_indices
from .xacro import parse_xacro_properties
from .metrics import (
    interpol_mse,
    quaternion_state_mse,
    euclidean_dist,
    separate_variables,
)

__all__ = [
    "q_to_rot_mat",
    "v_dot_q",
    "q_dot_q",
    "quaternion_inverse",
    "unit_quat",
    "skew_symmetric4",
    "quaternion_derivative",
    "euler_to_quaternion",
    "quaternion_to_euler",
    "undo_quaternion_flip",
    "decompose_quaternion",
    "rotation_matrix_to_quat",
    "rotation_matrix_to_euler",
    "get_reference_chunk",
    "reference_gather_indices",
    "parse_xacro_properties",
    "interpol_mse",
    "quaternion_state_mse",
    "euclidean_dist",
    "separate_variables",
]
