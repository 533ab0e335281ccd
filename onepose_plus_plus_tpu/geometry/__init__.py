from .rotations import (
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    qvec_to_matrix,
    matrix_to_qvec,
    angle_axis_rotate_point,
)
from .projection import (
    project_points,
    transform_points,
    unproject_depth,
    compose_K,
    crop_resize_K,
)
