"""Dataset-layer tests: manifests, GT supervision building (sparse gt_cell /
gt_fine_xy), homography warp adaptation, loaders, augmentors."""
import json
import os

import numpy as np
import pytest

from onepose_plus_plus_tpu.data import (
    FrameRecord,
    OnePosePlusInferenceDataset,
    OnePosePlusTrainDataset,
    TrainLoader,
    build_augmentor,
    load_manifest,
    sample_homography,
    save_3d_annotation,
    warp_image,
    warp_points,
)
from synthetic_scenes import make_scene, project_np

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def object_dir(tmp_path):
    """A miniature OnePose-style object: 3 frames + 3D annotation."""
    rng = np.random.default_rng(0)
    n_pts = 50
    K, pts, Ts = make_scene(rng, n_views=3, n_pts=n_pts, img=128.0)
    d = tmp_path / "obj"
    (d / "color").mkdir(parents=True)
    anno_p = str(d / "anno_3d_average.npz")
    desc = rng.standard_normal((n_pts, 128)).astype(np.float32)
    save_3d_annotation(anno_p, pts.astype(np.float32), desc, np.ones(n_pts, np.float32))
    save_3d_annotation(
        str(d / "anno_3d_average_coarse.npz"),
        pts.astype(np.float32),
        rng.standard_normal((n_pts, 256)).astype(np.float32),
        np.ones(n_pts, np.float32),
    )
    records = []
    for i in range(3):
        img = (rng.random((128, 128)) * 255).astype(np.uint8)
        p = str(d / "color" / f"{i}.png")
        cv2.imwrite(p, img)
        records.append(
            FrameRecord(
                img_file=p,
                pose=Ts[i],
                K=K,
                avg_anno3d_file=anno_p,
                assign_pairs=np.stack(
                    [np.arange(n_pts), np.arange(n_pts)]
                ),  # all points observed
            )
        )
    return records, K, pts, Ts, anno_p


class TestManifest:
    def test_roundtrip(self, tmp_path, object_dir):
        records, K, _, Ts, anno_p = object_dir
        manifest = [
            {
                "img_file": r.img_file,
                "pose": r.pose.tolist(),
                "K": r.K.tolist(),
                "avg_anno3d_file": r.avg_anno3d_file,
                "assign_pairs": r.assign_pairs.tolist(),
            }
            for r in records
        ]
        p = tmp_path / "manifest.json"
        p.write_text(json.dumps(manifest))
        out = load_manifest(str(p))
        assert len(out) == 3
        np.testing.assert_allclose(out[0].pose, Ts[0])
        np.testing.assert_allclose(out[0].K, K)


class TestTrainDataset:
    def test_shapes_and_gt_consistency(self, object_dir):
        records, K, pts, Ts, _ = object_dir
        S = 64
        ds = OnePosePlusTrainDataset(records, img_size=128, shape3d=S)
        assert len(ds) == 3
        ex = ds[0]
        assert ex["query_image"].shape == (128, 128, 1)
        assert ex["keypoints3d"].shape == (S, 3)
        assert ex["descriptors3d"].shape == (S, 128)
        assert ex["descriptors3d_coarse"].shape == (S, 256)
        assert ex["gt_cell"].shape == (S,)
        # for every supervised slot, projecting the 3D point with the GT pose
        # must land in the claimed coarse cell
        sup = np.flatnonzero(ex["gt_cell"] >= 0)
        assert len(sup) > 20  # most of the 50 points visible
        s_grid = 128 // 8
        for slot in sup[:10]:
            X = ex["keypoints3d"][slot]
            pc = ex["pose_gt"][:3, :3] @ X + ex["pose_gt"][:3, 3]
            uv = (ex["intrinsics"] @ pc)[:2] / pc[2]
            np.testing.assert_allclose(ex["gt_fine_xy"][slot], uv, atol=1e-3)
            cell = round(uv[1] / 8) * s_grid + round(uv[0] / 8)
            assert ex["gt_cell"][slot] == cell

    def test_subsample_keeps_assigned(self, object_dir):
        records, *_ = object_dir
        # capacity smaller than point count: assigned (=all 50) must survive
        ds = OnePosePlusTrainDataset(records, img_size=128, shape3d=40)
        ex = ds[0]
        # the synthetic FOV only covers ~60% of the points; all VISIBLE
        # assigned points must be supervised despite the subsampling
        assert (ex["gt_cell"] >= 0).sum() >= 20

    def test_warp_adaptation_doubles_and_stays_consistent(self, object_dir):
        records, *_ = object_dir
        ds = OnePosePlusTrainDataset(
            records, img_size=128, shape3d=64, image_warp_adapt=True
        )
        assert len(ds) == 6
        plain, warped = ds[0], ds[1]
        assert not np.allclose(plain["query_image"], warped["query_image"])
        # warped example still has a usable amount of supervision
        assert (warped["gt_cell"] >= 0).sum() > 10

    def test_warp_adaptation_is_epoch_fresh(self, object_dir):
        """Round-4 held-out root cause: a fixed per-index warp makes the
        doubled dataset 2N STATIC images, which a long schedule memorizes
        (on-chip diagnosis: cell-precision 0.40 mapped / 0.06 held-out at
        conf 0.64). set_epoch must yield a different homography per epoch
        for the warped half, same within an epoch, and leave the unwarped
        half untouched."""
        records, *_ = object_dir
        ds = OnePosePlusTrainDataset(
            records, img_size=128, shape3d=64, image_warp_adapt=True
        )
        ds.set_epoch(0)
        w0 = ds[1]["query_image"]
        plain0 = ds[0]["query_image"]
        w0_again = ds[1]["query_image"]
        np.testing.assert_array_equal(w0, w0_again)  # deterministic in-epoch
        ds.set_epoch(1)
        w1 = ds[1]["query_image"]
        plain1 = ds[0]["query_image"]
        assert not np.allclose(w0, w1)  # fresh warp per epoch
        np.testing.assert_array_equal(plain0, plain1)  # originals static
        # the loader plumbs the epoch through
        loader = TrainLoader(ds, batch_size=2, num_workers=0)
        next(loader.epoch(3))
        assert ds._epoch == 3

    def test_warp_all_warps_both_halves_independently(self, object_dir):
        """image_warp_all removes the static-original channel: with few
        mapping views the unwarped half is a positional-encoding view-lookup
        shortcut (epoch-40 on-chip diagnosis: 0.96 mapped vs 0.04 held-out
        5cm@5deg). Both halves must be warped, with INDEPENDENT epoch-fresh
        homographies, and keep usable GT supervision."""
        records, *_ = object_dir
        ds = OnePosePlusTrainDataset(
            records, img_size=128, shape3d=64, image_warp_adapt=True
        )
        da = OnePosePlusTrainDataset(
            records,
            img_size=128,
            shape3d=64,
            image_warp_adapt=True,
            image_warp_all=True,
        )
        da.set_epoch(0)
        ds.set_epoch(0)
        h0, h1 = da[0], da[1]
        # half 0 is now warped (differs from the static original)...
        assert not np.allclose(h0["query_image"], ds[0]["query_image"])
        # ...with a DIFFERENT homography than half 1 of the same record
        assert not np.allclose(h0["query_image"], h1["query_image"])
        # epoch-fresh on the formerly-static half too
        da.set_epoch(1)
        assert not np.allclose(h0["query_image"], da[0]["query_image"])
        # warped-GT consistency: both halves keep usable supervision
        assert (h0["gt_cell"] >= 0).sum() > 10
        assert (h1["gt_cell"] >= 0).sum() > 10
        # half 1's warp stream is unchanged by the flag (same epoch-keyed
        # generator family as image_warp_adapt alone)
        np.testing.assert_array_equal(
            ds[1]["query_image"], OnePosePlusTrainDataset(
                records, img_size=128, shape3d=64, image_warp_adapt=True,
                image_warp_all=True,
            )[1]["query_image"],
        )

    def test_warp_all_without_adapt_warps_undoubled(self, object_dir):
        """image_warp_all alone must not be a silent no-op (advisor round-4):
        without image_warp_adapt it warps every sample, with no doubling."""
        records, *_ = object_dir
        plain = OnePosePlusTrainDataset(records, img_size=128, shape3d=64)
        wa = OnePosePlusTrainDataset(
            records, img_size=128, shape3d=64, image_warp_all=True
        )
        assert len(wa) == len(plain)  # no doubling without warp_adapt
        wa.set_epoch(0)
        e0 = wa[0]["query_image"]
        assert not np.allclose(e0, plain[0]["query_image"])  # warped
        wa.set_epoch(1)
        assert not np.allclose(e0, wa[0]["query_image"])  # epoch-fresh
        assert (wa[0]["gt_cell"] >= 0).sum() > 10  # supervision survives

    def test_loader_batches(self, object_dir):
        records, *_ = object_dir
        ds = OnePosePlusTrainDataset(records, img_size=128, shape3d=32)
        loader = TrainLoader(ds, batch_size=2, drop_last=True)
        batches = list(loader.epoch(0))
        assert len(batches) == 1
        assert batches[0]["query_image"].shape == (2, 128, 128, 1)
        assert batches[0]["gt_cell"].shape == (2, 32)
        # different epochs shuffle differently (almost surely)
        b1 = list(loader.epoch(1))
        assert len(b1) == 1


class TestInferenceDataset:
    def test_frames(self, object_dir):
        records, K, _, Ts, anno_p = object_dir
        ds = OnePosePlusInferenceDataset(anno_p, records, img_size=128)
        assert len(ds) == 3
        f = ds[0]
        assert f["image"].shape == (128, 128)
        assert "pose_gt" in f
        assert ds.annotation["descriptors3d"].shape == (50, 128)
        assert ds.annotation["descriptors3d_coarse"].shape == (50, 256)
        demo = OnePosePlusInferenceDataset(anno_p, records, img_size=128, demo_mode=True)
        assert "pose_gt" not in demo[0]


class TestHomography:
    def test_warp_points_matches_image_warp(self):
        rng = np.random.default_rng(0)
        H = sample_homography(64, 64, rng)
        # a bright dot at (20, 30) should move to warp_points position
        img = np.zeros((64, 64), np.float32)
        img[30, 20] = 1.0
        warped = warp_image(img, H)
        target = warp_points(np.array([[20.0, 30.0]]), H)[0]
        if 2 < target[0] < 61 and 2 < target[1] < 61:
            yx = np.unravel_index(np.argmax(warped), warped.shape)
            assert abs(yx[1] - target[0]) <= 2 and abs(yx[0] - target[1]) <= 2

    def test_identity_like(self):
        H = np.eye(3)
        pts = np.array([[1.0, 2.0], [30.0, 40.0]])
        np.testing.assert_allclose(warp_points(pts, H), pts)


class TestAugment:
    @pytest.mark.parametrize("method", ["dark", "mobile", "YCB"])
    def test_augmentors_preserve_range(self, method):
        aug = build_augmentor(method, seed=0)
        img = np.random.default_rng(0).random((64, 64)).astype(np.float32)
        for _ in range(5):
            out = aug(img)
            assert out.shape == img.shape
            assert out.min() >= 0 and out.max() <= 1

    def test_ycb_applies_noise_and_blur(self):
        """YCB style must perturb the image (GaussNoise/blur fire at p=0.7)."""
        aug = build_augmentor("YCB", seed=1)
        img = np.full((64, 64), 0.5, np.float32)
        diffs = [np.abs(aug(img) - img).mean() for _ in range(8)]
        assert max(diffs) > 1e-3

    def test_fda_transfers_low_frequency_amplitude(self):
        """Golden spectral property: after FDA the low-freq amplitudes equal
        the style reference's; phase (structure) stays the source's."""
        from onepose_plus_plus_tpu.data.augment import fda_transfer

        rng = np.random.default_rng(0)
        src = rng.random((64, 64)).astype(np.float32) * 0.5 + 0.25
        ref = rng.random((64, 64)).astype(np.float32) * 0.5 + 0.25
        beta = 0.05
        out = fda_transfer(src, ref, beta)
        b = int(np.floor(64 * beta))
        amp_out = np.fft.fftshift(np.abs(np.fft.fft2(out)))
        amp_ref = np.fft.fftshift(np.abs(np.fft.fft2(ref)))
        amp_src = np.fft.fftshift(np.abs(np.fft.fft2(src)))
        c = 32
        band = np.s_[c - b : c + b, c - b : c + b]
        # the real-part projection (swapped band is not Hermitian-symmetric)
        # perturbs amplitudes, so assert direction, not equality: low band
        # moved to the reference's spectrum...
        assert (
            np.abs(amp_out[band] - amp_ref[band]).mean()
            < 0.2 * np.abs(amp_out[band] - amp_src[band]).mean()
        )
        # ...while high-frequency content remains the source's
        hi = np.ones((64, 64), bool)
        hi[band] = False
        src_err = np.abs(amp_out[hi] - amp_src[hi]).mean()
        ref_err = np.abs(amp_out[hi] - amp_ref[hi]).mean()
        assert src_err < 0.2 * ref_err

    def test_fda_augmentor_resizes_reference(self):
        ref = np.random.default_rng(1).random((32, 48)).astype(np.float32)
        aug = build_augmentor("FDA", seed=0, ref_images=[ref], p=1.0)
        img = np.random.default_rng(2).random((64, 64)).astype(np.float32)
        out = aug(img)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1

    def test_none(self):
        assert build_augmentor(None) is None
        with pytest.raises(ValueError):
            build_augmentor("bogus")
        with pytest.raises(ValueError):
            build_augmentor("FDA")  # needs ref images


class _FakeDataset:
    """Minimal __len__/__getitem__ dataset for loader-mechanics tests."""

    def __init__(self, n=32, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            import time

            time.sleep(self.delay)
        return {"x": np.full((4,), i, np.float32)}


class TestTrainLoaderWorkers:
    def test_parallel_matches_synchronous(self):
        """Worker scheduling must not change batch content or order."""
        ds = _FakeDataset(33)
        sync = list(TrainLoader(ds, 8, seed=3, num_workers=0).epoch(1))
        par = list(TrainLoader(ds, 8, seed=3, num_workers=4).epoch(1))
        assert len(sync) == len(par) == 4
        for a, b in zip(sync, par):
            np.testing.assert_array_equal(a["x"], b["x"])

    def test_loading_overlaps_consumer(self):
        """With workers + prefetch, producer time hides behind the consumer:
        wall time must beat the fully-serial sum by a wide margin."""
        import time

        ds = _FakeDataset(32, delay=0.01)
        loader = TrainLoader(ds, 4, num_workers=4, prefetch=2)
        t0 = time.time()
        n = 0
        for _ in loader.epoch(0):
            time.sleep(0.04)  # simulated train step
            n += 1
        elapsed = time.time() - t0
        assert n == 8
        serial = 8 * (4 * 0.01 + 0.04)  # loader and step strictly alternating
        assert elapsed < 0.8 * serial, f"no overlap: {elapsed:.3f}s vs {serial:.3f}s"

    def test_worker_errors_propagate(self):
        class Bad(_FakeDataset):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(TrainLoader(Bad(8), 4, num_workers=2).epoch(0))

    def test_early_break_does_not_hang(self):
        loader = TrainLoader(_FakeDataset(64), 4, num_workers=2, prefetch=2)
        for i, _ in enumerate(loader.epoch(0)):
            if i == 1:
                break  # generator close must unblock the producer


def test_device_prefetch_preserves_order():
    from onepose_plus_plus_tpu.parallel.mesh import device_prefetch

    out = list(device_prefetch(iter(range(5)), lambda x: x * 2, depth=2))
    assert out == [0, 2, 4, 6, 8]
    assert list(device_prefetch(iter([]), lambda x: x)) == []


def test_merge_coco_roundtrip(tmp_path):
    """merge.py writer <-> records_from_coco reader coupling (the reader once
    indexed the per-object anno_2d.json LIST as a dict; caught by the
    overfit-e2e drive)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from merge import merge_annotations

    from onepose_plus_plus_tpu.data import save_3d_annotation
    from onepose_plus_plus_tpu.data.dataset import records_from_coco

    rng = np.random.default_rng(0)
    obj = tmp_path / "sfm" / "0001-thing"
    (obj / "anno").mkdir(parents=True)
    seq = tmp_path / "data" / "0001-thing" / "thing-1"
    for sub in ("color", "poses_ba", "intrin_ba"):
        (seq / sub).mkdir(parents=True)
    save_3d_annotation(
        str(obj / "anno" / "anno_3d_average.npz"),
        rng.standard_normal((10, 3)).astype(np.float32),
        rng.standard_normal((10, 128)).astype(np.float32),
        np.ones(10, np.float32),
    )
    entries = []
    for i in range(2):
        np.savetxt(seq / "poses_ba" / f"{i}.txt", np.eye(4))
        np.savetxt(seq / "intrin_ba" / f"{i}.txt", np.eye(3) * 100)
        entries.append(
            {
                "img_id": i,
                "img_file": str(seq / "color" / f"{i}.png"),
                "keypoints2d": [[1.0, 2.0]],
                "scores2d": [[1.0]],
                "assign_matrix": [[0, 3], [5, 7]],
            }
        )
    with open(obj / "anno" / "anno_2d.json", "w") as f:
        json.dump(entries, f)

    out = tmp_path / "train.json"
    merge_annotations(str(tmp_path / "sfm"), str(out))
    recs = records_from_coco(str(out))
    assert len(recs) == 2
    for r in recs:
        assert r.avg_anno3d_file.endswith("anno_3d_average.npz")
        np.testing.assert_array_equal(r.assign_pairs, [[0, 3], [5, 7]])
        assert r.pose is not None and r.K is not None
