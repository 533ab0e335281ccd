"""Keypoint-free SfM engine (COLMAP/DeepLM replacement, TPU-native)."""
from .pairs import exhaustive_pairs, index_window_pairs, pose_covisibility_pairs
from .coarse_match import PairMatches, SceneKeypoints, run_pairs, merge_keypoints
from .tracks import build_tracks, tracks_to_arrays
from .triangulate import TriangulationResult, triangulate_scene, verify_scene_matches
from .post_optimization import (
    assign_keyframes_greedy,
    build_refinement_pairs,
    run_fine_refinement,
    build_depth_problems,
    optimize_depths,
    write_back,
    post_optimize,
)
from .filtering import (
    points_in_box,
    filter_by_3d_box,
    track_length_for_budget,
    filter_track_length,
    merge_close_points,
)
from .annotation import average_track_descriptors, build_assign_matrix, build_annotations
from .incremental import incremental_sfm
from .runner import SfMConfig, run_sfm, extract_keypoint_descriptors
