"""Tests for the SfM post-optimization stage (greedy keyframes, depth LM,
write-back), point filtering, and annotation building — on synthetic models."""
import numpy as np
import pytest

from onepose_plus_plus_tpu.data.colmap_model import Camera, Image, Point3D
from onepose_plus_plus_tpu.sfm import (
    assign_keyframes_greedy,
    build_annotations,
    build_refinement_pairs,
    filter_by_3d_box,
    filter_track_length,
    merge_close_points,
    points_in_box,
    post_optimize,
    track_length_for_budget,
)
from onepose_plus_plus_tpu.geometry.rotations import matrix_to_qvec

import jax.numpy as jnp
from synthetic_scenes import make_scene, project_np


def build_synthetic_model(noise=0.0, perturb_depth=0.0, seed=0, n_views=5, n_pts=30):
    """A COLMAP-style model from a synthetic scene; optionally perturb the
    point positions along the assigned keyframe ray (simulating coarse
    triangulation error that depth refinement must undo)."""
    rng = np.random.default_rng(seed)
    K, pts, Ts = make_scene(rng, n_views=n_views, n_pts=n_pts)
    cameras = {
        i: Camera(i, "PINHOLE", 512, 512, np.array([500.0, 500.0, 256.0, 256.0]))
        for i in range(n_views)
    }
    images = {}
    for i in range(n_views):
        uv, _ = project_np(K, Ts[i], pts)
        uv = uv + rng.normal(0, noise, uv.shape)
        qvec = np.asarray(matrix_to_qvec(jnp.asarray(Ts[i][:3, :3])))
        images[i] = Image(
            i,
            qvec,
            Ts[i][:3, 3].copy(),
            i,
            f"f{i}.png",
            uv,
            np.arange(n_pts, dtype=np.int64),  # kpt k observes point k
        )
    points3d = {}
    for p in range(n_pts):
        xyz = pts[p].copy()
        points3d[p] = Point3D(
            p,
            xyz,
            np.zeros(3, np.uint8),
            0.0,
            np.arange(n_views, dtype=np.int64),
            np.full(n_views, p, dtype=np.int64),
        )
    if perturb_depth > 0:
        # move each point along the ray from camera 0 (scale depth)
        R0, t0 = Ts[0][:3, :3], Ts[0][:3, 3]
        c0 = -R0.T @ t0
        for p in range(n_pts):
            ray = points3d[p].xyz - c0
            points3d[p].xyz = c0 + ray * rng.uniform(
                1 - perturb_depth, 1 + perturb_depth
            )
    return cameras, images, points3d, pts, Ts


class TestGreedyAssignment:
    def test_every_point_assigned_once(self):
        cams, imgs, p3d, _, _ = build_synthetic_model()
        keyframes, assignment = assign_keyframes_greedy(imgs, p3d)
        assert set(assignment.keys()) == set(p3d.keys())
        # first keyframe grabs every point (all points visible everywhere)
        assert len(keyframes) == 1
        kf = next(iter(keyframes))
        st = keyframes[kf]
        assert (st >= 0).sum() == len(p3d)
        for pid, (im, k) in assignment.items():
            assert im == kf and imgs[im].point3D_ids[k] == pid

    def test_partial_visibility_multiple_keyframes(self):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_views=4, n_pts=12)
        # split tracks: points 0-5 only in views 0/1; 6-11 only in views 2/3
        for pid, p in p3d.items():
            views = [0, 1] if pid < 6 else [2, 3]
            p.image_ids = np.asarray(views, np.int64)
            p.point2D_idxs = np.full(2, pid, np.int64)
        for i, im in imgs.items():
            for k in range(len(im.point3D_ids)):
                pid = im.point3D_ids[k]
                if pid >= 0 and i not in p3d[pid].image_ids:
                    im.point3D_ids[k] = -1
        keyframes, assignment = assign_keyframes_greedy(imgs, p3d)
        assert set(assignment.keys()) == set(p3d.keys())
        assert len(keyframes) >= 2

    def test_refinement_pairs_cover_tracks(self):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_views=3, n_pts=10)
        keyframes, _ = assign_keyframes_greedy(imgs, p3d)
        pairs = build_refinement_pairs(imgs, p3d, keyframes)
        kf = next(iter(keyframes))
        partners = {p.pair[1] for p in pairs if p.pair[0] == kf}
        assert partners == {i for i in imgs if i != kf}
        for p in pairs:
            assert len(p.mkpts0) == 10  # every track observed in every view


class TestDepthOptimization:
    @pytest.mark.parametrize("solver", ["lm", "first_order"])
    def test_recovers_depth_perturbation(self, solver):
        cams, imgs, p3d, gt_pts, Ts = build_synthetic_model(
            noise=0.0, perturb_depth=0.15
        )
        before = np.stack([p3d[p].xyz for p in sorted(p3d)])
        err_before = np.linalg.norm(before - gt_pts, axis=1)
        summary = post_optimize(cams, imgs, p3d, solver=solver)
        assert summary["num_optimized"] == len(p3d)
        after = np.stack([p3d[p].xyz for p in sorted(p3d)])
        err_after = np.linalg.norm(after - gt_pts, axis=1)
        assert np.median(err_after) < np.median(err_before) * 0.1
        assert np.median(err_after) < 2e-3

    def test_keypoints_reprojected_after_writeback(self):
        cams, imgs, p3d, gt_pts, Ts = build_synthetic_model(perturb_depth=0.1)
        post_optimize(cams, imgs, p3d)
        # xys must equal the projection of the refined 3D points
        for i, im in imgs.items():
            uv_expected, _ = project_np(
                cams[i].K, np.vstack([np.hstack([im.R(), im.tvec[:, None]]), [0, 0, 0, 1]]),
                np.stack([p3d[int(p)].xyz for p in im.point3D_ids]),
            )
            np.testing.assert_allclose(im.xys, uv_expected, atol=0.05)


class TestFiltering:
    def test_points_in_box(self):
        # unit cube centered at origin
        corners = np.array(
            [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ],
            dtype=np.float64,
        )
        pts = np.array([[0, 0, 0], [0.9, 0.9, 0.9], [1.1, 0, 0], [0, 2, 0]])
        mask = points_in_box(pts, corners)
        assert mask.tolist() == [True, True, False, False]
        # padding admits the near-out point
        assert points_in_box(pts, corners, padding_ratio=0.2).tolist() == [
            True, True, True, False,
        ]

    def test_filter_by_3d_box_detaches_tracks(self):
        cams, imgs, p3d, gt, _ = build_synthetic_model(n_pts=10)
        corners = np.array(
            [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ],
            dtype=np.float64,
        ) * 0.05  # tiny box: most points outside
        kept = filter_by_3d_box(imgs, p3d, corners)
        inside = points_in_box(gt, corners)
        assert set(kept.keys()) == set(np.flatnonzero(inside).tolist())
        for im in imgs.values():
            for k, pid in enumerate(im.point3D_ids):
                assert pid == -1 or int(pid) in kept

    def test_track_length_budget(self):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_views=5, n_pts=20)
        # shorten half the tracks to length 2
        for pid in range(10):
            p3d[pid].image_ids = p3d[pid].image_ids[:2]
            p3d[pid].point2D_idxs = p3d[pid].point2D_idxs[:2]
        thr = track_length_for_budget(p3d, max_num_kp3d=12)
        kept = filter_track_length(imgs, p3d, thr)
        assert len(kept) <= 12
        assert all(len(p.image_ids) >= thr for p in kept.values())

    def test_merge_close_points(self):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_pts=6)
        # make points 0 and 1 coincident
        p3d[1].xyz = p3d[0].xyz + 1e-5
        merged = merge_close_points(imgs, p3d, dist_threshold=1e-3)
        assert len(merged) == 5
        main = 0 if 0 in merged else 1
        assert len(merged[main].image_ids) == 10  # tracks concatenated
        for im in imgs.values():
            assert not np.isin(im.point3D_ids, [1 if main == 0 else 0]).any()


class TestAnnotation:
    def test_average_and_assign(self, tmp_path):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_views=3, n_pts=8)
        D = 16
        rng = np.random.default_rng(0)
        descs = {i: rng.standard_normal((8, D)).astype(np.float32) for i in imgs}
        out = build_annotations(
            imgs, p3d, descs, coarse_descriptors=descs, out_dir=str(tmp_path)
        )
        assert out["descriptors3d"].shape == (8, D)
        # average over the 3 views of each track
        expected0 = np.mean([descs[i][0] for i in range(3)], axis=0)
        np.testing.assert_allclose(out["descriptors3d"][0], expected0, rtol=1e-5)
        assert len(out["anno_2d"]) == 3  # all images pass the 5% gate
        a = out["anno_2d"][0]
        am = np.asarray(a["assign_matrix"])
        assert am.shape[0] == 2
        # files written
        import os

        assert os.path.exists(tmp_path / "anno_3d_average.npz")
        assert os.path.exists(tmp_path / "anno_3d_average_coarse.npz")
        assert os.path.exists(tmp_path / "anno_2d.json")

    def test_min_match_gate(self):
        cams, imgs, p3d, _, _ = build_synthetic_model(n_views=2, n_pts=20)
        # image 1 loses all registrations
        imgs[1].point3D_ids[:] = -1
        descs = {i: np.ones((20, 4), np.float32) for i in imgs}
        out = build_annotations(imgs, p3d, descs)
        assert [a["img_id"] for a in out["anno_2d"]] == [0]
