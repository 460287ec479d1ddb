from hifihr_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    rot6d_to_matrix,
    quaternion_to_matrix,
    axis_angle_to_quaternion,
)
from hifihr_tpu.geometry.projection import (
    perspective_project,
    orthographic_project,
    orthographic_proj_withz,
    intrinsics_to_ndc,
)
from hifihr_tpu.geometry import joints
