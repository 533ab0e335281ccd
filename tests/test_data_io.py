"""Round-trip and semantics tests for host-side IO: COLMAP models, images,
point-cloud capacity padding, annotations, metrics."""
import numpy as np
import pytest

from onepose_plus_plus_tpu.data import (
    Camera,
    Image,
    Point3D,
    crop_img_by_bbox,
    grouped_load_h5,
    grouped_save_h5,
    load_3d_annotation,
    load_h5,
    model_stats,
    pad_point_cloud,
    pad_to_shape,
    read_model,
    save_3d_annotation,
    save_h5,
    square_bbox,
    write_model,
)
from onepose_plus_plus_tpu.eval import (
    add_metric,
    aggregate_metrics,
    projection_2d_error,
    query_pose_error,
)


def make_model(n_img=3, n_pts=10, seed=0):
    rng = np.random.default_rng(seed)
    cameras = {
        1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 501.0, 320.0, 240.0]))
    }
    images = {}
    for i in range(1, n_img + 1):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        images[i] = Image(
            i,
            q,
            rng.standard_normal(3),
            1,
            f"frame_{i:04d}.png",
            rng.uniform(0, 640, (5, 2)),
            np.array([1, -1, 2, -1, 3], dtype=np.int64)
            if i == 1
            else np.full(5, -1, np.int64),
        )
    points = {}
    for p in range(1, n_pts + 1):
        points[p] = Point3D(
            p,
            rng.standard_normal(3),
            rng.integers(0, 255, 3).astype(np.uint8),
            float(rng.uniform(0, 2)),
            np.array([1, 2], dtype=np.int64),
            np.array([0, 3], dtype=np.int64),
        )
    return cameras, images, points


class TestColmapIO:
    @pytest.mark.parametrize("ext", [".bin", ".txt"])
    def test_roundtrip(self, tmp_path, ext):
        cams, imgs, pts = make_model()
        write_model(cams, imgs, pts, str(tmp_path), ext=ext)
        cams2, imgs2, pts2 = read_model(str(tmp_path), ext=ext)
        assert set(cams2) == set(cams)
        c1, c2 = cams[1], cams2[1]
        assert c1.model == c2.model and c1.width == c2.width
        np.testing.assert_allclose(c1.params, c2.params)
        np.testing.assert_allclose(c1.K, c2.K)
        for i in imgs:
            np.testing.assert_allclose(imgs[i].qvec, imgs2[i].qvec, atol=1e-12)
            np.testing.assert_allclose(imgs[i].tvec, imgs2[i].tvec, atol=1e-12)
            np.testing.assert_allclose(imgs[i].xys, imgs2[i].xys, atol=1e-9)
            np.testing.assert_array_equal(imgs[i].point3D_ids, imgs2[i].point3D_ids)
            assert imgs[i].name == imgs2[i].name
        for p in pts:
            np.testing.assert_allclose(pts[p].xyz, pts2[p].xyz, atol=1e-12)
            np.testing.assert_array_equal(pts[p].image_ids, pts2[p].image_ids)
            np.testing.assert_array_equal(pts[p].rgb, pts2[p].rgb)

    def test_cross_format(self, tmp_path):
        cams, imgs, pts = make_model()
        write_model(cams, imgs, pts, str(tmp_path / "b"), ext=".bin")
        m_bin = read_model(str(tmp_path / "b"), ext=".bin")
        write_model(*m_bin, str(tmp_path / "t"), ext=".txt")
        m_txt = read_model(str(tmp_path / "t"), ext=".txt")
        np.testing.assert_allclose(
            m_bin[2][5].xyz, m_txt[2][5].xyz, atol=1e-12
        )

    def test_rotation_consistency(self):
        _, imgs, _ = make_model()
        im = imgs[1]
        R = im.R()
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        T = im.T()
        np.testing.assert_allclose(T[:3, :3], R)

    def test_stats(self):
        cams, imgs, pts = make_model()
        s = model_stats(cams, imgs, pts)
        assert s["num_points3D"] == 10
        assert s["num_reg_images"] == 1
        assert s["mean_track_length"] == 2.0


class TestH5:
    def test_flat_roundtrip(self, tmp_path):
        data = {"a": np.arange(10.0), "b": np.ones((3, 4), np.float32)}
        p = str(tmp_path / "x.h5")
        save_h5(data, p)
        out = load_h5(p)
        np.testing.assert_allclose(out["a"], data["a"])

    def test_grouped_roundtrip(self, tmp_path):
        data = {
            "img0.png": {"keypoints": np.ones((5, 2))},
            "img1.png": {"keypoints": np.zeros((3, 2))},
        }
        p = str(tmp_path / "g.h5")
        grouped_save_h5(data, p)
        out = grouped_load_h5(p)
        assert set(out) == set(data)
        assert out["img1.png"]["keypoints"].shape == (3, 2)


class TestPreprocessing:
    def test_pad_to_shape(self):
        img = np.ones((10, 20))
        out, mask = pad_to_shape(img, (16, 24))
        assert out.shape == (16, 24)
        assert mask[:10, :20].all() and not mask[10:].any()

    def test_square_bbox(self):
        b = square_bbox(np.array([0, 0, 10, 20.0]))
        assert b[3] - b[1] == b[2] - b[0] == 20

    def test_crop_updates_K(self):
        img = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
        K = np.array([[100.0, 0, 60], [0, 100, 50], [0, 0, 1]])
        crop, K_crop = crop_img_by_bbox(img, np.array([20, 10, 84, 74]), K, 128)
        assert crop.shape == (128, 128)
        # pixel (20, 10) maps to (0, 0); (60, 50) -> ((60-20)*2, (50-10)*2)
        assert np.isclose(K_crop[0, 2], (60 - 20) * 2)
        assert np.isclose(K_crop[1, 2], (50 - 10) * 2)
        assert np.isclose(K_crop[0, 0], 200.0)

    def test_pad_point_cloud_under(self):
        rng = np.random.default_rng(0)
        out = pad_point_cloud(
            rng.standard_normal((10, 3)), rng.standard_normal((10, 8)), None, 16, rng
        )
        assert out["keypoints3d"].shape == (16, 3)
        assert out["valid"].sum() == 10
        assert (out["orig_idx"][:10] == np.arange(10)).all()
        assert (out["orig_idx"][10:] == -1).all()
        assert (out["descriptors3d"][10:] == 0).all()

    def test_pad_point_cloud_over_keeps_required(self):
        rng = np.random.default_rng(1)
        keep = np.array([3, 17, 42])
        out = pad_point_cloud(
            rng.standard_normal((50, 3)),
            rng.standard_normal((50, 8)),
            None,
            8,
            rng,
            keep_idx=keep,
        )
        assert out["keypoints3d"].shape == (8, 3)
        assert set(keep).issubset(set(out["orig_idx"].tolist()))
        assert len(set(out["orig_idx"].tolist())) == 8

    def test_annotation_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        kp = rng.standard_normal((20, 3)).astype(np.float32)
        desc = rng.standard_normal((20, 128)).astype(np.float32)
        sc = rng.random(20).astype(np.float32)
        p = str(tmp_path / "anno_3d_average.npz")
        save_3d_annotation(p, kp, desc, sc)
        # stored layout matches reference: descriptors3d is [D, m]
        with np.load(p) as z:
            assert z["descriptors3d"].shape == (128, 20)
            assert z["scores3d"].shape == (20, 1)
        out = load_3d_annotation(p)
        np.testing.assert_allclose(out["descriptors3d"], desc, rtol=1e-6)
        np.testing.assert_allclose(out["keypoints3d"], kp)


class TestMetrics:
    def test_pose_error_zero(self):
        T = np.eye(4)
        r, t = query_pose_error(T, T)
        assert r < 1e-5 and t < 1e-8

    def test_pose_error_known(self):
        Tgt = np.eye(4)
        Tp = np.eye(4)
        th = np.deg2rad(10)
        Tp[:3, :3] = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        Tp[:3, 3] = [0.03, 0, 0]
        r, t = query_pose_error(Tp, Tgt)
        assert np.isclose(r, 10.0, atol=1e-4)
        assert np.isclose(t, 3.0, atol=1e-6)

    def test_add_and_proj2d(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.05, 0.05, (100, 3))
        diameter = 0.1 * np.sqrt(3)
        Tgt = np.eye(4)
        Tgt[:3, 3] = [0, 0, 0.5]
        Tp = Tgt.copy()
        Tp[:3, 3] += [0.001, 0, 0]  # 1mm off
        assert add_metric(Tp, Tgt, pts, diameter)
        Tbad = Tgt.copy()
        Tbad[:3, 3] += [0.1, 0, 0]
        assert not add_metric(Tbad, Tgt, pts, diameter)
        K = np.array([[500.0, 0, 256], [0, 500, 256], [0, 0, 1]])
        assert projection_2d_error(Tp, Tgt, pts, K)
        assert not projection_2d_error(Tbad, Tgt, pts, K)

    def test_add_symmetric_uses_closest(self):
        # 180-deg rotated symmetric ring: ADD fails, ADD-S passes
        ang = np.linspace(0, 2 * np.pi, 60, endpoint=False)
        pts = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], 1) * 0.05
        Tgt = np.eye(4)
        Tgt[:3, 3] = [0, 0, 0.5]
        Tp = Tgt.copy()
        Tp[:3, :3] = np.diag([-1.0, -1.0, 1.0])  # rotate ring by pi
        diameter = 0.1
        assert not add_metric(Tp, Tgt, pts, diameter, symmetric=False)
        assert add_metric(Tp, Tgt, pts, diameter, symmetric=True)

    def test_aggregate(self):
        m = aggregate_metrics(
            [0.5, 2, 4, 10], [0.5, 2, 4, 10], add_flags=[1, 1, 0, 0]
        )
        assert m["1cm@1degree"] == 0.25
        assert m["3cm@3degree"] == 0.5
        assert m["5cm@5degree"] == 0.75
        assert m["ADD metric"] == 0.5


class TestColmapDatabase:
    def test_roundtrip_and_pair_ids(self, tmp_path):
        from onepose_plus_plus_tpu.data import (
            COLMAPDatabase,
            image_ids_from_pair_id,
            pair_id_from_image_ids,
        )

        pid = pair_id_from_image_ids(7, 3)
        assert image_ids_from_pair_id(pid) == (3, 7)

        db = COLMAPDatabase(str(tmp_path / "scene.db"))
        cam = db.add_camera(1, 640, 480, [500.0, 500.0, 320.0, 240.0])
        i1 = db.add_image("a.png", cam)
        i2 = db.add_image("b.png", cam)
        kp = np.random.default_rng(0).uniform(0, 640, (20, 2)).astype(np.float32)
        db.add_keypoints(i1, kp)
        m = np.array([[0, 5], [3, 2]], np.uint32)
        db.add_matches(i2, i1, m)  # reversed order exercises the swap
        db.commit()
        np.testing.assert_allclose(db.read_keypoints(i1), kp)
        np.testing.assert_array_equal(db.read_matches(i2, i1), m)
        np.testing.assert_array_equal(db.read_matches(i1, i2), m[:, ::-1])
        assert db.read_images() == {i1: "a.png", i2: "b.png"}
        db.close()

    def test_export_scene(self, tmp_path):
        from onepose_plus_plus_tpu.data import COLMAPDatabase, export_scene_to_database

        kpts = {0: np.zeros((4, 2)), 1: np.ones((3, 2))}
        matches = {(0, 1): np.array([[0, 1], [2, 2]])}
        Ks = {i: np.eye(3) * 500 for i in (0, 1)}
        sizes = {i: (480, 640) for i in (0, 1)}
        p = str(tmp_path / "exp.db")
        export_scene_to_database(p, kpts, matches, Ks, sizes)
        db = COLMAPDatabase(p)
        imgs = db.read_images()
        assert len(imgs) == 2
        kp = db.read_keypoints(1)
        np.testing.assert_allclose(kp, 0.5)  # +0.5 COLMAP offset applied
        db.close()
