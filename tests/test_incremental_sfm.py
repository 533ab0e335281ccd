"""Tests for the unknown-pose path: essential-matrix relative pose,
extrinsics-only BA, and the incremental mapper on synthetic scenes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_plus_plus_tpu.geometry.bundle_adjust import (
    estimate_relative_pose,
    refine_extrinsics,
)
from onepose_plus_plus_tpu.sfm.coarse_match import PairMatches, merge_keypoints
from onepose_plus_plus_tpu.sfm.incremental import incremental_sfm
from onepose_plus_plus_tpu.eval.trajectory import (
    absolute_trajectory_error,
    camera_centers_from_poses,
)
from synthetic_scenes import make_scene, project_np
from test_sfm_pipeline import simulate_matcher


class TestRelativePose:
    def test_recovers_up_to_scale(self):
        rng = np.random.default_rng(0)
        K, pts, Ts = make_scene(rng, n_views=2, n_pts=128)
        uv0, _ = project_np(K, Ts[0], pts)
        uv1, _ = project_np(K, Ts[1], pts)
        uv1 += rng.normal(0, 0.3, uv1.shape)
        rel = estimate_relative_pose(
            jnp.asarray(uv0.astype(np.float32)),
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.ones(128, bool),
            jax.random.PRNGKey(0),
        )
        assert bool(rel.ok) and int(rel.num_inliers) > 100
        # GT relative pose
        T01 = Ts[1] @ np.linalg.inv(Ts[0])
        R_gt, t_gt = T01[:3, :3], T01[:3, 3]
        R_err = np.asarray(rel.R) @ R_gt.T
        ang = np.rad2deg(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang
        t_dir = np.asarray(rel.t)
        cos = abs(t_dir @ t_gt) / (np.linalg.norm(t_gt) + 1e-9)
        assert cos > 0.99  # direction up to sign

    def test_with_outliers(self):
        rng = np.random.default_rng(1)
        K, pts, Ts = make_scene(rng, n_views=2, n_pts=128)
        uv0, _ = project_np(K, Ts[0], pts)
        uv1, _ = project_np(K, Ts[1], pts)
        uv1[:40] = rng.uniform(0, 512, (40, 2))
        rel = estimate_relative_pose(
            jnp.asarray(uv0.astype(np.float32)),
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.ones(128, bool),
            jax.random.PRNGKey(0),
            num_hypotheses=512,
        )
        assert bool(rel.ok)
        inl = np.asarray(rel.inliers)
        assert inl[40:].mean() > 0.9 and inl[:40].mean() < 0.2


class TestRefineExtrinsics:
    def test_corrects_perturbed_poses(self):
        rng = np.random.default_rng(2)
        K, pts, Ts = make_scene(rng, n_views=4, n_pts=64)
        uvs = np.stack([project_np(K, T, pts)[0] for T in Ts])
        T_pert = Ts.copy()
        for i in range(4):
            T_pert[i, :3, 3] += rng.normal(0, 0.02, 3)
        T_ref, cost = refine_extrinsics(
            jnp.asarray(T_pert.astype(np.float32)),
            jnp.asarray(np.tile(K, (4, 1, 1)).astype(np.float32)),
            jnp.asarray(np.tile(pts, (4, 1, 1)).astype(np.float32)),
            jnp.asarray(uvs.astype(np.float32)),
            jnp.ones((4, 64), bool),
        )
        T_ref = np.asarray(T_ref)
        for i in range(4):
            assert np.abs(T_ref[i, :3, 3] - Ts[i][:3, 3]).max() < 1e-3


class TestIncrementalSfM:
    @pytest.mark.slow
    def test_maps_synthetic_scene(self):
        rng = np.random.default_rng(3)
        n_views = 6
        K, pts, Ts = make_scene(rng, n_views=n_views, n_pts=60)
        raw = simulate_matcher(K, Ts, pts, noise=0.3, seed=3, drop_frac=0.1)
        scene = merge_keypoints(raw)
        out = incremental_sfm(
            scene, {i: K for i in range(n_views)}, min_seed_matches=30
        )
        assert len(out["registered"]) == n_views, out["registered"]
        assert len(out["points"]) > 40
        # trajectory correct up to similarity (monocular gauge)
        est = np.stack([out["poses"][i] for i in range(n_views)])
        ate = absolute_trajectory_error(
            camera_centers_from_poses(est),
            camera_centers_from_poses(Ts),
        )
        assert ate["ate_rmse"] < 0.02, ate["ate_rmse"]

    def test_unmappable_scene_returns_empty(self):
        scene = merge_keypoints(
            [
                PairMatches(
                    (0, 1),
                    np.zeros((4, 2)),
                    np.zeros((4, 2)),
                    np.ones(4),
                )
            ]
        )
        out = incremental_sfm(scene, {0: np.eye(3), 1: np.eye(3)})
        assert out["registered"] == [] and out["points"] == {}
