"""Inference pipeline tests: batched query->match->PnP with a mock matcher,
and the object detector's affine RANSAC + bbox logic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_plus_plus_tpu.inference import (
    LocalFeatureObjectDetector,
    ransac_affine,
    run_inference,
)
from synthetic_scenes import make_scene, project_np


class TestRansacAffine:
    def test_recovers_affine_with_outliers(self):
        rng = np.random.default_rng(0)
        A_gt = np.array([[1.2, 0.1, 30.0], [-0.05, 0.9, -10.0]])
        src = rng.uniform(0, 400, (100, 2))
        dst = src @ A_gt[:, :2].T + A_gt[:, 2]
        dst[:30] = rng.uniform(0, 400, (30, 2))  # 30% outliers
        A, inl, n = ransac_affine(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.ones(100, bool),
            jax.random.PRNGKey(0),
            inlier_threshold_px=2.0,
        )
        assert int(n) >= 65
        np.testing.assert_allclose(np.asarray(A), A_gt, atol=0.01)
        assert not np.asarray(inl)[:30].any()

    def test_respects_validity_mask(self):
        src = np.zeros((10, 2))
        dst = np.zeros((10, 2))
        A, inl, n = ransac_affine(
            jnp.asarray(src),
            jnp.asarray(dst),
            jnp.zeros(10, bool),
            jax.random.PRNGKey(0),
        )
        assert int(n) == 0


class TestDetector:
    def _fake_matcher(self, shift, n_matches=32):
        """Matcher stub: DB view 0 maps into the query translated by `shift`."""

        def fn(img0, img1):
            v = img0.shape[0]
            rng = np.random.default_rng(0)
            k = n_matches
            mk0 = rng.uniform(10, 100, (v, k, 2)).astype(np.float32)
            mk1 = np.zeros_like(mk0)
            mask = np.zeros((v, k), bool)
            # view 0: clean translation; other views: garbage few matches
            mk1[0] = mk0[0] + np.asarray(shift)
            mask[0] = True
            for i in range(1, v):
                mk1[i] = rng.uniform(0, 400, (k, 2))
                mask[i, :4] = True
            return {
                "mkpts0_c": jnp.asarray(mk0),
                "mkpts1_c": jnp.asarray(mk1),
                "mconf": jnp.ones((v, k)),
                "match_mask": jnp.asarray(mask),
            }

        return fn

    def test_detect_translated_object(self):
        db = np.zeros((3, 128, 128), np.float32)
        det = LocalFeatureObjectDetector(
            self._fake_matcher((100.0, 50.0)), db, output_size=64
        )
        query = np.zeros((512, 512), np.float32)
        bbox, n_inl = det.detect_bbox(query, jax.random.PRNGKey(0))
        assert n_inl >= 30
        # identity affine + shift: corners (0,0)-(128,128) -> +[100, 50]
        np.testing.assert_allclose(bbox, [100, 50, 228, 178], atol=1.0)
        crop, K_crop, bbox_sq, _ = det.detect(
            query, np.eye(3) * 500, jax.random.PRNGKey(0)
        )
        assert crop.shape == (64, 64)
        assert bbox_sq[2] - bbox_sq[0] == bbox_sq[3] - bbox_sq[1]

    def test_fallback_centered_box(self):
        def no_match_fn(img0, img1):
            v = img0.shape[0]
            return {
                "mkpts0_c": jnp.zeros((v, 8, 2)),
                "mkpts1_c": jnp.zeros((v, 8, 2)),
                "mconf": jnp.zeros((v, 8)),
                "match_mask": jnp.zeros((v, 8), bool),
            }

        det = LocalFeatureObjectDetector(no_match_fn, np.zeros((2, 64, 64), np.float32))
        bbox, n_inl = det.detect_bbox(
            np.zeros((480, 640), np.float32), jax.random.PRNGKey(0)
        )
        assert n_inl < 6
        np.testing.assert_allclose(bbox, [320 - 240, 0, 320 + 240, 480])

    def test_previous_pose_detect(self):
        rng = np.random.default_rng(0)
        K, pts, Ts = make_scene(rng, n_views=1, n_pts=8)
        corners = np.array(
            [[x, y, z] for x in (-0.1, 0.1) for y in (-0.1, 0.1) for z in (-0.1, 0.1)]
        )
        det = LocalFeatureObjectDetector(None, np.zeros((1, 8, 8), np.float32))
        crop, K_crop, bbox = det.previous_pose_detect(
            np.zeros((512, 512), np.float32), K, Ts[0], corners
        )
        uv, _ = project_np(K, Ts[0], corners)
        assert bbox[0] <= uv[:, 0].min() and bbox[2] >= uv[:, 0].max()
        assert crop.shape == (512, 512)


class MockMatcherModel:
    """Stand-in for OnePosePlusModel: 'matches' by projecting the 3D points
    with a hidden GT pose per frame (passed via the batch)."""

    def __init__(self, gt_poses, noise=0.5, n_matches=128):
        self.gt_poses = gt_poses
        self.noise = noise
        self.n_matches = n_matches

    def apply(self, variables, batch, train=False):
        # jax-traceable: static index selection, jnp math (runs under jit)
        kpts3d = batch["keypoints3d"]  # [B, S, 3]
        K = batch["intrinsics"]
        b, s, _ = kpts3d.shape
        rng = np.random.default_rng(0)
        k = self.n_matches
        idx = np.stack([rng.choice(s, k, replace=False) for _ in range(b)])
        noise = rng.normal(0, self.noise, (b, k, 2)).astype(np.float32)
        Ts = jnp.asarray(
            np.stack([self.gt_poses[i % len(self.gt_poses)] for i in range(b)]),
            jnp.float32,
        )
        pts = jnp.take_along_axis(kpts3d, jnp.asarray(idx)[..., None], axis=1)
        pc = jnp.einsum("bij,bkj->bki", Ts[:, :3, :3], pts) + Ts[:, None, :3, 3]
        uvw = jnp.einsum("bij,bkj->bki", K, pc)
        uv = uvw[..., :2] / uvw[..., 2:3]
        return {
            "mkpts_3d": pts,
            "mkpts_query_f": uv + jnp.asarray(noise),
            "mconf": jnp.ones((b, k)),
            "match_mask": jnp.ones((b, k), bool),
        }


class TestRunInference:
    @pytest.mark.slow
    def test_end_to_end_with_mock_matcher(self):
        rng = np.random.default_rng(3)
        n_frames = 4
        K, pts, Ts = make_scene(rng, n_views=n_frames, n_pts=400)
        anno = {
            "keypoints3d": pts.astype(np.float32),
            "descriptors3d": rng.standard_normal((400, 8)).astype(np.float32),
        }
        frames = [
            {
                "image": np.zeros((64, 64), np.float32),
                "K": K.astype(np.float32),
                "pose_gt": Ts[i].astype(np.float32),
            }
            for i in range(n_frames)
        ]
        model = MockMatcherModel([Ts[i] for i in range(n_frames)])
        res = run_inference(
            model,
            {},
            frames,
            anno,
            shape3d=512,
            frame_batch=4,
            reproj_threshold_px=3.0,
        )
        assert res.poses.shape == (n_frames, 4, 4)
        assert res.ok.all()
        assert res.metrics is not None
        # mock matches are near-perfect: sub-degree / sub-cm accuracy
        assert (res.R_errs < 1.0).all(), res.R_errs
        assert (res.t_errs < 2.0).all(), res.t_errs
        assert res.metrics["5cm@5degree"] == 1.0

    @pytest.mark.slow
    def test_no_gt_demo_mode(self):
        rng = np.random.default_rng(4)
        K, pts, Ts = make_scene(rng, n_views=2, n_pts=300)
        anno = {
            "keypoints3d": pts.astype(np.float32),
            "descriptors3d": rng.standard_normal((300, 8)).astype(np.float32),
        }
        frames = [
            {"image": np.zeros((64, 64), np.float32), "K": K.astype(np.float32)}
            for _ in range(2)
        ]
        model = MockMatcherModel([Ts[0], Ts[1]])
        res = run_inference(model, {}, frames, anno, shape3d=400, frame_batch=2)
        assert res.metrics is None and res.R_errs is None
        assert res.poses.shape == (2, 4, 4)


class TestMeshSharding:
    @pytest.mark.slow
    def test_run_inference_on_8_device_mesh(self):
        import jax

        from onepose_plus_plus_tpu.parallel.mesh import make_mesh
        from synthetic_scenes import make_scene

        rng = np.random.default_rng(5)
        K, pts, Ts = make_scene(rng, n_views=8, n_pts=300)
        anno = {
            "keypoints3d": pts.astype(np.float32),
            "descriptors3d": rng.standard_normal((300, 8)).astype(np.float32),
        }
        frames = [
            {
                "image": np.zeros((64, 64), np.float32),
                "K": K.astype(np.float32),
                "pose_gt": Ts[i].astype(np.float32),
            }
            for i in range(8)
        ]
        model = MockMatcherModel([Ts[i] for i in range(8)])
        mesh = make_mesh(jax.devices()[:8])
        res = run_inference(
            model, {}, frames, anno, shape3d=320, frame_batch=8, mesh=mesh,
            reproj_threshold_px=3.0,
        )
        assert res.poses.shape == (8, 4, 4)
        assert res.ok.all()
        assert res.metrics["5cm@5degree"] == 1.0


class TestQueryStepTransferForms:
    """make_query_step accepts unbatched point clouds (broadcast in-jit) and
    uint8 images (normalized in-jit) — both must match the batched/float
    forms exactly."""

    @pytest.mark.slow
    def test_unbatched_pc_and_uint8_image_match_batched_float(self):
        import jax

        rng = np.random.default_rng(7)
        b, s = 2, 256
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
        model = MockMatcherModel([np.eye(4, dtype=np.float32)] * b)
        from onepose_plus_plus_tpu.inference.pipeline import make_query_step

        step = make_query_step(model, {}, num_hypotheses=64)

        img_u8 = rng.integers(0, 256, (b, 64, 64, 1)).astype(np.uint8)
        pc = {
            "keypoints3d": rng.standard_normal((s, 3)).astype(np.float32),
            "descriptors3d": rng.standard_normal((s, 8)).astype(np.float32),
        }
        base = {
            "intrinsics": np.tile(K, (b, 1, 1)),
        }
        batched_float = dict(
            base,
            query_image=img_u8.astype(np.float32) / 255.0,
            keypoints3d=np.tile(pc["keypoints3d"], (b, 1, 1)),
            descriptors3d=np.tile(pc["descriptors3d"], (b, 1, 1)),
        )
        compact = dict(base, query_image=img_u8, **pc)
        key = jax.random.PRNGKey(0)
        out_a = step(
            {k: jnp.asarray(v) for k, v in batched_float.items()}, key, None
        )
        out_b = step({k: jnp.asarray(v) for k, v in compact.items()}, key, None)
        for a, c in zip(out_a[:2], out_b[:2]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
