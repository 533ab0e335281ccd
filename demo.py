"""Video demo CLI — `python demo.py +experiment=inference_demo.yaml`.

CLI-parity entry point for reference ``demo.py``: sequential tracking over a
video/frame sequence — detector on frame 0 (or on tracking loss:
inliers < min_track_inliers), previous-pose bbox projection otherwise, crop +
2D-3D match + PnP per frame, 3D-box overlay frames, final mp4.

The tracking loop is inherently sequential (pose feedback between frames,
SURVEY.md §7.3) but each step is one fused jitted device program
(match + PnP), keeping per-frame latency low.
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

from onepose_plus_plus_tpu.data.dataset import OnePosePlusInferenceDataset
from onepose_plus_plus_tpu.data.preprocessing import pad_point_cloud
from onepose_plus_plus_tpu.inference.detector import LocalFeatureObjectDetector
from onepose_plus_plus_tpu.inference.pipeline import make_query_step
from onepose_plus_plus_tpu.models.build import (
    build_loftr_matcher,
    build_onepose_model,
)
from onepose_plus_plus_tpu.utils import load_checkpoint, load_config
from onepose_plus_plus_tpu.utils.visualization import make_video, save_demo_frame

CONFIGS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def inference(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from inference import sequence_records  # CLI sibling helpers

    data_dir = cfg.dataset.data_dir
    sfm_dir = cfg.dataset.sfm_outputs_dir
    obj_dirs = [
        d
        for d in sorted(glob.glob(os.path.join(data_dir, "*")))
        if os.path.isdir(d)
        and os.path.exists(
            os.path.join(
                sfm_dir, os.path.basename(d), "anno", "anno_3d_average.npz"
            )
        )
    ]
    if not obj_dirs:
        print(f"no demo objects under {data_dir}")
        return
    obj_dir = obj_dirs[0]
    obj_name = os.path.basename(obj_dir)
    # early startup line (watchdog sentinel): backend init survived the axon
    # relay dial; everything after may sit in a multi-minute first compile
    print(
        f"demo: {obj_name} on {[d.platform for d in jax.devices()]}",
        flush=True,
    )
    anno_path = os.path.join(sfm_dir, obj_name, "anno", "anno_3d_average.npz")
    seqs = [
        s
        for s in sorted(glob.glob(os.path.join(obj_dir, "*")))
        if os.path.isdir(os.path.join(s, "color"))
    ]
    records = sequence_records(seqs[-1])
    img_size = cfg.dataset.img_resize
    ds = OnePosePlusInferenceDataset(anno_path, records, img_size, demo_mode=True)

    box_p = os.path.join(obj_dir, "box3d_corners.txt")
    corners = (
        np.loadtxt(box_p).reshape(8, 3)
        if os.path.exists(box_p)
        else _bbox_corners_from_points(ds.annotation["keypoints3d"])
    )

    # models
    model = build_onepose_model(dict(cfg.get("model", {}) or {}))
    shape3d = cfg.dataset.shape3d
    probe = {
        "query_image": np.zeros((1, img_size, img_size, 1), np.float32),
        "keypoints3d": np.zeros((1, shape3d, 3), np.float32),
        "descriptors3d": np.zeros((1, shape3d, 128), np.float32),
        "descriptors3d_coarse": np.zeros((1, shape3d, 256), np.float32),
    }
    wpath = cfg.get_path("network.onepose_weights")
    variables = (
        load_checkpoint(wpath)
        if wpath
        else model.init(jax.random.PRNGKey(666), probe, train=False)
    )

    matcher = build_loftr_matcher()
    lpath = cfg.get_path("network.loftr_weights")
    p0 = np.zeros((1, img_size, img_size, 1), np.float32)
    lvars = (
        load_checkpoint(lpath)
        if lpath
        else matcher.init(jax.random.PRNGKey(666), p0, p0, method="match_coarse")
    )

    @jax.jit
    def coarse_fn(i0, i1):
        return matcher.apply(lvars, i0, i1, method="match_coarse")

    # DB views: sample frames from the SfM model images
    from onepose_plus_plus_tpu.data.colmap_model import read_model
    from onepose_plus_plus_tpu.data.image_io import imread_gray, resize_image

    model_dir = os.path.join(sfm_dir, obj_name, "model")
    db_views = []
    if os.path.exists(os.path.join(model_dir, "cameras.bin")):
        _, imgs, _ = read_model(model_dir)
        names = [im.name for im in imgs.values()]
        step = max(1, len(names) // cfg.demo.num_ref_views)
        map_seq = seqs[0]
        for name in names[::step][: cfg.demo.num_ref_views]:
            p = os.path.join(map_seq, "color", name)
            if os.path.exists(p):
                db_views.append(
                    resize_image(imread_gray(p), (img_size, img_size))
                )
    if not db_views:
        db_views = [np.zeros((img_size, img_size), np.float32)]
    detector = LocalFeatureObjectDetector(
        coarse_fn, np.stack(db_views), output_size=img_size
    )

    gen = np.random.default_rng(666)
    pc = pad_point_cloud(
        ds.annotation["keypoints3d"],
        ds.annotation["descriptors3d"],
        ds.annotation.get("scores3d"),
        shape3d,
        gen,
    )
    desc_c = None
    if "descriptors3d_coarse" in ds.annotation:
        desc_c = pad_point_cloud(
            ds.annotation["keypoints3d"],
            ds.annotation["descriptors3d_coarse"],
            None,
            shape3d,
            np.random.default_rng(666),
        )["descriptors3d"]

    step = make_query_step(
        model,
        variables,
        reproj_threshold_px=cfg.demo.pnp_reproj_thr,
        num_hypotheses=cfg.demo.num_hypotheses,
    )

    # untracked output location (ADVICE r2: demo runs kept dirtying tracked
    # demo_frames/; override with demo.frames_dir)
    out_dir = cfg.get_path("demo.frames_dir") or os.path.join(
        "artifacts", "demo", obj_name
    )
    frame_paths = []
    pose_prev, inliers_prev = None, 0
    rng = jax.random.PRNGKey(0)
    # point cloud: one device upload for the whole video — the query step
    # broadcasts unbatched [S, ...] entries on device (inference/pipeline.py)
    pc_dev = {
        "keypoints3d": jax.device_put(jnp.asarray(pc["keypoints3d"])),
        "descriptors3d": jax.device_put(jnp.asarray(pc["descriptors3d"])),
    }
    if desc_c is not None:
        pc_dev["descriptors3d_coarse"] = jax.device_put(jnp.asarray(desc_c))
    for fid in range(len(ds)):
        f = ds[fid]
        if pose_prev is None or inliers_prev < cfg.demo.min_track_inliers:
            rng, sub = jax.random.split(rng)
            crop, K_crop, bbox, _ = detector.detect(f["image"], f["K"], sub)
        else:
            crop, K_crop, bbox = detector.previous_pose_detect(
                f["image"], f["K"], pose_prev, corners
            )
        batch = {
            "query_image": jnp.asarray(crop[None, ..., None], jnp.float32),
            "intrinsics": jnp.asarray(K_crop[None].astype(np.float32)),
            **pc_dev,
        }
        rng, sub = jax.random.split(rng)
        poses, n_inl, ok, _, _, _ = step(batch, sub, None)
        pose = np.asarray(poses[0])
        inliers_prev = int(np.asarray(n_inl[0]))
        pose_prev = pose if bool(np.asarray(ok[0])) else None
        fp = os.path.join(out_dir, f"{fid:06d}.png")
        save_demo_frame(f["image"], pose, f["K"], corners, fp, inliers_prev)
        frame_paths.append(fp)
        if fid % 25 == 0:
            print(f"frame {fid}/{len(ds)} inliers={inliers_prev}")

    make_video(frame_paths, cfg.demo.output_video)
    print(f"demo video -> {cfg.demo.output_video}")


def _bbox_corners_from_points(pts: np.ndarray) -> np.ndarray:
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    return np.array(
        [
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
        ]
    )


def main() -> None:
    cfg = load_config(CONFIGS_DIR, sys.argv[1:])
    if cfg.get("type") is None:
        raise SystemExit("usage: python demo.py +experiment=inference_demo.yaml")
    inference(cfg)


if __name__ == "__main__":
    main()
