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
from .epipolar import (
    essential_from_poses,
    fundamental_from_poses,
    sampson_distance,
    epipolar_error,
    verify_matches,
    relative_pose,
    skew,
)
from .triangulation import (
    projection_matrix,
    triangulate_tracks,
    triangulate_and_filter,
    triangulate_two_view,
)
from .pnp import PnPResult, ransac_pnp, ransac_pnp_batch
from .levenberg_marquardt import lm_solve, lm_solve_scalar, first_order_solve
from .residuals import depth_residual_track, unproject
from .bundle_adjust import (
    refine_extrinsics,
    estimate_relative_pose,
    RelativePose,
)
