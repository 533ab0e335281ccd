"""CLI smoke tests: training loop end-to-end on a tiny synthetic dataset
(8-device CPU mesh), ARKit capture parser, LINEMOD converter."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic_scenes import make_scene, project_np

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, args, cwd=REPO, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon TPU plugin out of CPU subprocesses entirely: the
    # sitecustomize register() dials the TPU relay at interpreter start
    # and can deadlock the child before main() runs
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return subprocess.run(
        [sys.executable, script] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_train_cli_runs_and_checkpoints(tmp_path):
    from onepose_plus_plus_tpu.data import save_3d_annotation

    rng = np.random.default_rng(0)
    n_pts, img = 40, 64
    K, pts, Ts = make_scene(rng, n_views=8, n_pts=n_pts, img=float(img))
    d = tmp_path / "obj"
    (d / "color").mkdir(parents=True)
    anno_p = str(d / "anno_3d_average.npz")
    save_3d_annotation(
        anno_p,
        pts.astype(np.float32),
        rng.standard_normal((n_pts, 128)).astype(np.float32),
        np.ones(n_pts, np.float32),
    )
    save_3d_annotation(
        str(d / "anno_3d_average_coarse.npz"),
        pts.astype(np.float32),
        rng.standard_normal((n_pts, 256)).astype(np.float32),
        np.ones(n_pts, np.float32),
    )
    manifest = []
    for i in range(8):
        p = str(d / "color" / f"{i}.png")
        cv2.imwrite(p, (rng.random((img, img)) * 255).astype(np.uint8))
        manifest.append(
            {
                "img_file": p,
                "pose": Ts[i].tolist(),
                "K": K.tolist(),
                "avg_anno3d_file": anno_p,
                "assign_pairs": np.stack([np.arange(n_pts)] * 2).tolist(),
            }
        )
    mpath = tmp_path / "train.json"
    mpath.write_text(json.dumps(manifest))

    ckpt_dir = tmp_path / "ckpts"
    r = run_cli(
        "train_onepose_plus.py",
        [
            "+experiment=train",
            f"dataset.train_anno_file={mpath}",
            "dataset.img_resize=64",
            "dataset.shape3d_train=32",
            "dataset.image_warp_adapt=false",
            "trainer.epochs=1",
            "trainer.batch_size=1",
            "trainer.n_devices=8",
            f"ckpt_dir={ckpt_dir}",
            f"log_dir={tmp_path / 'logs'}",
            # tiny model so the test compiles fast
            "model.loftr_coarse.layer_iter_n=1",
            "model.match_coarse.max_matches=16",
            "model.match_coarse.train_max_matches=16",
            "model.match_coarse.train_pad_num_gt_min=4",
        ],
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "loss" in r.stdout
    exp_dirs = list((ckpt_dir).glob("*/last"))
    assert exp_dirs, f"no checkpoint written: {r.stdout[-1500:]}"


class TestParseScannedData:
    def _make_capture(self, d):
        """Synthetic ARKit capture: mp4 + ARposes.txt + Box.txt + Frames.txt."""
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(0)
        fps, n_frames, w, h = 10, 8, 192, 144
        vw = cv2.VideoWriter(
            os.path.join(d, "Frames.m4v"),
            cv2.VideoWriter_fourcc(*"mp4v"),
            fps,
            (w, h),
        )
        for i in range(n_frames):
            frame = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            vw.write(frame)
        vw.release()
        with open(os.path.join(d, "Frames.txt"), "w") as f:
            for i in range(n_frames):
                f.write(f"{i},{i/fps},120.0,120.0,{w/2},{h/2}\n")
        # object box 20cm at 0.6m in front of the cameras
        with open(os.path.join(d, "Box.txt"), "w") as f:
            f.write("# px,py,pz,ex,ey,ez,qw,qx,qy,qz\n")
            f.write("0.0,0.0,0.0,0.2,0.2,0.2,1.0,0.0,0.0,0.0\n")
        # ARKit camera-to-world: camera at z=+0.6 looking at origin.
        # ARKit convention: camera looks down -z; the parser flips y/z, so a
        # camera with identity rotation at (0,0,0.6) views the origin.
        with open(os.path.join(d, "ARposes.txt"), "w") as f:
            for i in range(n_frames):
                x = 0.02 * i
                f.write(f"{i/fps},{x},0.0,0.6,1.0,0.0,0.0,0.0\n")

    def test_parses_capture(self, tmp_path):
        obj_root = tmp_path / "obj" / "seq-1"
        self._make_capture(str(obj_root))
        r = run_cli(
            "parse_scanned_data.py",
            ["--scanned_object_path", str(tmp_path / "obj"), "--hw", "64"],
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        colors = os.listdir(obj_root / "color")
        assert len(colors) >= 4, r.stdout
        stem = os.path.splitext(colors[0])[0]
        K = np.loadtxt(obj_root / "intrin" / f"{stem}.txt")
        T = np.loadtxt(obj_root / "poses" / f"{stem}.txt")
        assert K.shape == (3, 3) and T.shape == (4, 4)
        # pose must put the object in front of the camera
        assert T[2, 3] > 0.1
        img = cv2.imread(str(obj_root / "color" / colors[0]))
        assert img.shape[:2] == (64, 64)
        corners = np.loadtxt(tmp_path / "obj" / "box3d_corners.txt")
        assert corners.shape == (8, 3)
        assert os.path.islink(obj_root / "poses_ba")


class TestParseLMRealData:
    def test_converts_bop_object(self, tmp_path):
        rng = np.random.default_rng(1)
        obj_dir = tmp_path / "lm" / "000001"
        (obj_dir / "rgb").mkdir(parents=True)
        K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]])
        gt, cams = {}, {}
        for i in range(3):
            cv2.imwrite(
                str(obj_dir / "rgb" / f"{i:06d}.png"),
                (rng.random((480, 640, 3)) * 255).astype(np.uint8),
            )
            R = np.eye(3)
            t_mm = np.array([0.0, 0.0, 600.0])
            gt[str(i)] = [{"cam_R_m2c": R.reshape(-1).tolist(),
                           "cam_t_m2c": t_mm.tolist(), "obj_id": 1}]
            cams[str(i)] = {"cam_K": K.reshape(-1).tolist()}
        (obj_dir / "scene_gt.json").write_text(json.dumps(gt))
        (obj_dir / "scene_camera.json").write_text(json.dumps(cams))
        models_dir = tmp_path / "lm" / "models"
        models_dir.mkdir()
        (models_dir / "models_info.txt").write_text(
            "1 diameter 102.0 min_x -37.9 min_y -38.7 min_z -45.8 "
            "size_x 75.8 size_y 77.5 size_z 91.6\n"
        )
        out = tmp_path / "out"
        r = run_cli(
            "parse_lm_real_data.py",
            [
                "--data_base_dir", str(tmp_path / "lm"),
                "--obj_id", "1",
                "--assign_onepose_id", "0801",
                "--output_data_dir", str(out),
            ],
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        seq = out / "0801-lm1-others" / "lm1-1"
        frames = os.listdir(seq / "color")
        assert len(frames) == 3
        img = cv2.imread(str(seq / "color" / frames[0]))
        assert img.shape[:2] == (256, 256)
        T = np.loadtxt(seq / "poses_ba" / "0.txt")
        assert np.isclose(T[2, 3], 0.6)  # mm -> m conversion
        K_crop = np.loadtxt(seq / "intrin_ba" / "0.txt")
        assert K_crop.shape == (3, 3)


def test_load_records_detects_coco_vs_manifest(tmp_path):
    """Structural JSON detection (the 512-byte head sniff misclassified real
    merged COCO files whose "annotations" key sits beyond the head)."""
    import json
    import sys

    sys.path.insert(0, REPO)
    from train_onepose_plus import load_records

    coco = {
        "images": [
            {"id": i, "img_file": f"/x/color/{i}.png"} for i in range(40)
        ],
        "annotations": [],
    }
    p1 = tmp_path / "coco.json"
    p1.write_text(json.dumps(coco))
    recs = load_records(str(p1))
    assert len(recs) == 40 and recs[0].img_file.endswith("0.png")

    manifest = [{"img_file": "/x/color/0.png"}]
    p2 = tmp_path / "manifest.json"
    p2.write_text(json.dumps(manifest))
    recs = load_records(str(p2))
    assert len(recs) == 1
