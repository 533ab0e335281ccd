"""End-to-end CLI integration: build a tiny synthetic OnePose-format object,
run the full SfM CLI (run.py) with a random-weight matcher, then the eval CLI
(inference.py), then merge.py. Exercises object discovery, stage caching, the
COLMAP-replacement pipeline, annotation building, and metrics.txt."""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic_scenes import make_scene

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_onepose_object(root, obj="0001-toy-box", seq="toy-1", n_frames=6, img=128):
    """Geometrically consistent synthetic scene: every view renders the SAME
    textured plane (z=0) through its true plane-induced homography, so any
    photometric matcher's correspondences satisfy the epipolar geometry."""
    rng = np.random.default_rng(0)
    K, pts, Ts = make_scene(rng, n_views=n_frames, n_pts=32, img=float(img))
    seq_dir = os.path.join(root, obj, seq)
    for sub in ("color", "intrin_ba", "poses_ba"):
        os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
    tex = (np.kron(rng.random((32, 32)), np.ones((8, 8))) * 255).astype(np.uint8)
    S = np.array([[256 / 0.8, 0, 128], [0, 256 / 0.8, 128], [0, 0, 1.0]])
    for i in range(n_frames):
        R, t = Ts[i][:3, :3], Ts[i][:3, 3]
        M = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)  # plane->image
        H = M @ np.linalg.inv(S)
        im = cv2.warpPerspective(tex, H, (img, img))
        cv2.imwrite(os.path.join(seq_dir, "color", f"{i}.png"), im)
        np.savetxt(os.path.join(seq_dir, "intrin_ba", f"{i}.txt"), K)
        np.savetxt(os.path.join(seq_dir, "poses_ba", f"{i}.txt"), Ts[i])
    corners = np.array(
        [[x, y, z] for z in (-0.3, 0.3) for y in (-0.3, 0.3) for x in (-0.3, 0.3)]
    )
    np.savetxt(os.path.join(root, obj, "box3d_corners.txt"), corners)
    return obj


def run_cli(script, args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon TPU plugin out of CPU subprocesses entirely: the
    # sitecustomize register() dials the TPU relay at interpreter start
    # and can deadlock the child before main() runs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    # persistent compile cache: repeat CLI invocations skip XLA compiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return subprocess.run(
        [sys.executable, script] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.slow
def test_sfm_then_inference_then_merge(tmp_path):
    data_dir = str(tmp_path / "data")
    sfm_dir = str(tmp_path / "sfm_outputs")
    obj = make_onepose_object(data_dir)

    r = run_cli(
        "run.py",
        [
            "+preprocess=sfm_inference_onepose",
            "ids=null",  # synthetic object id is outside the real test split
            f"dataset.data_dir={data_dir}",
            f"dataset.outputs_dir={sfm_dir}",
            "dataset.down_ratio=1",
            "sfm.pair_batch=4",
            "sfm.covis_num=5",
            "sfm.max_epipolar_error_px=8.0",
            "model.match_coarse.thr=0.000001",
            "model.compute_dtype=float32",  # CPU test: keep f32 numerics
        ],
    )
    assert r.returncode == 0, r.stderr[-3000:]
    anno = os.path.join(sfm_dir, obj, "anno", "anno_3d_average.npz")
    assert os.path.exists(anno), r.stdout[-2000:]
    assert os.path.exists(os.path.join(sfm_dir, obj, "model", "cameras.bin"))
    with np.load(anno) as z:
        n_pts = len(z["keypoints3d"])
    assert n_pts > 10, f"too few SfM points: {n_pts}"
    stats = json.load(open(os.path.join(sfm_dir, obj, "stats.json")))
    assert stats["num_points3D"] == n_pts
    # regression bands calibrated on the recorded artifact run
    # (artifacts/e2e/stats.json: 12 frames/256px -> 72 pts, track 2.24,
    # 1.48 px obs-weighted reprojection error): a geometrically consistent
    # scene must triangulate multi-view tracks at low reprojection error
    assert stats["mean_track_length"] >= 2.0, stats
    assert stats["mean_reprojection_error"] < 2.5, stats
    assert stats["num_reg_images"] >= 4, stats
    # visual-debug postprocess artifacts (reference vis_tkl_filtered_pcds /
    # plot_utils gallery): pre/post-filter PLY clouds + confidence-colored
    # match plots, produced by the default preprocess config
    vis3d = os.path.join(sfm_dir, obj, "vis3d")
    for ply in ("point_cloud_pre_filter.ply", "point_cloud_post_filter.ply"):
        p = os.path.join(vis3d, ply)
        assert os.path.exists(p), f"missing {p}"
        assert "element vertex" in open(p).read(200)
    gallery = glob.glob(os.path.join(vis3d, "matches", "*.png"))
    assert len(gallery) == 6, gallery

    # second run must reuse cached stages (no overwrite) and still succeed
    r2 = run_cli(
        "run.py",
        [
            "+preprocess=sfm_inference_onepose",
            "ids=null",  # synthetic object id is outside the real test split
            f"dataset.data_dir={data_dir}",
            f"dataset.outputs_dir={sfm_dir}",
            "dataset.down_ratio=1",
            "model.compute_dtype=float32",
        ],
    )
    assert r2.returncode == 0, r2.stderr[-3000:]

    out_dir = str(tmp_path / "results")
    r3 = run_cli(
        "inference.py",
        [
            "+experiment=inference_onepose",
            "ids=null",
            f"dataset.data_dir={data_dir}",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            "dataset.img_resize=128",
            "dataset.shape3d=128",
            "inference.frame_batch=2",
            "inference.num_hypotheses=64",
            "model.compute_dtype=float32",
            f"output_dir={out_dir}",
        ],
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    metrics_txt = os.path.join(out_dir, "metrics.txt")
    assert os.path.exists(metrics_txt)
    content = open(metrics_txt).read()
    assert "ALL:" in content and obj in content

    # demo: sequential tracking video over the same object
    video_out = str(tmp_path / "demo.mp4")
    r_demo = run_cli(
        "demo.py",
        [
            "+experiment=inference_demo",
            f"dataset.data_dir={data_dir}",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            "dataset.img_resize=128",
            "dataset.shape3d=128",
            "demo.num_ref_views=3",
            "model.compute_dtype=float32",
            f"demo.output_video={video_out}",
        ],
    )
    assert r_demo.returncode == 0, r_demo.stderr[-3000:]
    assert os.path.exists(video_out), r_demo.stdout[-1500:]

    merged = str(tmp_path / "train_anno.json")
    r4 = run_cli(
        "merge.py",
        [
            "+preprocess=merge_anno",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.out_train_file={merged}",
            "dataset.out_val_file=null",
        ],
    )
    assert r4.returncode == 0, r4.stderr[-3000:]
    blob = json.load(open(merged))
    assert len(blob["images"]) > 0
    assert blob["annotations"][0]["avg_anno3d_file"].endswith("anno_3d_average.npz")
