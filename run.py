"""SfM preprocessing CLI — `python run.py +preprocess=sfm_inference_onepose.yaml`.

CLI-parity entry point for reference ``run.py`` (object discovery by the
``XXXX-name-seq`` naming scheme, per-object keypoint-free SfM + postprocess +
annotation building). The reference fans objects out over Ray; objects are
independent, so here they run sequentially with every per-object stage
batched on device (SURVEY.md §2.5) — shard the object list across processes
for multi-host scale.
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

from onepose_plus_plus_tpu.models.build import build_loftr_matcher, make_loftr_fns
from onepose_plus_plus_tpu.sfm.runner import SfMConfig, run_sfm
from onepose_plus_plus_tpu.utils import load_config, load_checkpoint

CONFIGS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def discover_objects(data_dir: str, ids=None, exception_obj_names=()):
    """Find object dirs named ``XXXX-name`` and their ``name-N`` sequences.

    ``ids`` restricts to the configured split's object-id prefixes and
    ``exception_obj_names`` removes listed objects (reference ``run.py:25-62``
    / preprocess yaml ``ids`` blocks).
    """
    exception_obj_names = {e for e in (exception_obj_names or ()) if e}
    id_set = {str(i) for i in ids} if ids else None
    objects = []
    for obj_dir in sorted(glob.glob(os.path.join(data_dir, "*"))):
        base = os.path.basename(obj_dir)
        if not os.path.isdir(obj_dir) or "-" not in base:
            continue
        if base in exception_obj_names:
            continue
        if id_set is not None and base[:4] not in id_set:
            continue
        name = base.split("-", 1)[1]
        seqs = sorted(glob.glob(os.path.join(obj_dir, f"{name.split('-')[0]}-*")))
        seqs = [s for s in seqs if os.path.isdir(os.path.join(s, "color"))]
        if seqs:
            objects.append((base, seqs))
    return objects


def load_sequence(seq_dir: str):
    """Read a OnePose-format sequence: color/ + intrin_ba/ + poses_ba/ (+Box)."""
    frames = sorted(
        glob.glob(os.path.join(seq_dir, "color", "*.png"))
        + glob.glob(os.path.join(seq_dir, "color", "*.jpg"))
    )
    paths, poses, Ks = [], [], []
    for f in frames:
        stem = os.path.splitext(os.path.basename(f))[0]
        pose_p = os.path.join(seq_dir, "poses_ba", stem + ".txt")
        intr_p = os.path.join(seq_dir, "intrin_ba", stem + ".txt")
        if not (os.path.exists(pose_p) and os.path.exists(intr_p)):
            continue
        paths.append(f)
        poses.append(np.loadtxt(pose_p).reshape(4, 4))
        Ks.append(np.loadtxt(intr_p).reshape(3, 3))
    box_p = os.path.join(os.path.dirname(seq_dir), "box3d_corners.txt")
    corners = np.loadtxt(box_p).reshape(8, 3) if os.path.exists(box_p) else None
    return paths, poses, Ks, corners


def sfm(cfg) -> None:
    import jax

    data_dir = cfg.dataset.data_dir
    out_root = cfg.dataset.outputs_dir
    objects = discover_objects(
        data_dir,
        ids=cfg.get("ids"),
        exception_obj_names=cfg.get("exception_obj_names") or (),
    )
    if not objects:
        print(f"no objects found under {data_dir}")
        return
    # multi-host object sharding (the reference's Ray/SLURM global fan-out,
    # run.py:64-89): objects are independent; shard the list across processes
    # via OBJ_SHARD / OBJ_NUM_SHARDS (or jax process index under
    # jax.distributed)
    shard = int(os.environ.get("OBJ_SHARD", "0"))
    n_shards = int(os.environ.get("OBJ_NUM_SHARDS", "1"))
    if n_shards > 1:
        objects = objects[shard::n_shards]
        print(f"shard {shard}/{n_shards}: {len(objects)} objects")
    # early startup line: proves jax backend init got past the axon relay
    # dial (which can deadlock a child interpreter) before the first compile
    import jax

    print(
        f"mapping {len(objects)} object(s) on "
        f"{[d.platform for d in jax.devices()]}",
        flush=True,
    )

    matcher = build_loftr_matcher(dict(cfg.get("model", {}) or {}))
    weights_path = cfg.get_path("network.loftr_weights")
    if weights_path:
        variables = load_checkpoint(weights_path)
    else:
        print("WARNING: no loftr_weights configured — random-weight matcher")
        probe = np.zeros((1, 64, 64, 1), np.float32)
        # init through the FULL match path so backbone+coarse+fine params exist
        variables = matcher.init(jax.random.PRNGKey(666), probe, probe)
    coarse_fn, refine_fn, extract_fn = make_loftr_fns(matcher, variables)

    s = cfg.sfm
    sfm_cfg = SfMConfig(
        down_ratio=cfg.dataset.down_ratio,
        covis_num=s.covis_num,
        min_rotation_deg=s.min_rotation_deg,
        pair_batch=s.pair_batch,
        max_epipolar_error_px=s.max_epipolar_error_px,
        max_reproj_error_px=s.max_reproj_error_px,
        min_tri_angle_deg=s.min_tri_angle_deg,
        max_track_length=s.max_track_length,
        max_num_kp3d=cfg.dataset.max_num_kp3d,
        merge_dist_threshold=s.merge_dist_threshold,
        solver_type=s.solver_type,
        overwrite=s.overwrite,
        save_vis3d=bool(s.get("save_vis3d", True)),
        match_gallery_num=int(s.get("match_gallery_num", 0)),
    )
    # reference uses 1 mapping sequence (sfm yaml); which one is configurable
    map_idx = int(cfg.dataset.get("mapping_seq_index", 0))
    for obj_name, seqs in objects:
        seq = seqs[map_idx if map_idx < len(seqs) else 0]
        paths, poses, Ks, corners = load_sequence(seq)
        if len(paths) < 2:
            print(f"[{obj_name}] skipped: <2 posed frames")
            continue
        out_dir = os.path.join(out_root, obj_name)
        print(f"[{obj_name}] {len(paths)} frames -> {out_dir}")
        stats = run_sfm(
            paths,
            poses,
            Ks,
            out_dir,
            coarse_fn,
            refine_fn=refine_fn,
            extract_fn=extract_fn,
            box_corners_3d=corners,
            cfg=sfm_cfg,
        )
        print(f"[{obj_name}] {stats}")


def main() -> None:
    cfg = load_config(CONFIGS_DIR, sys.argv[1:])
    if cfg.get("type") is None:
        raise SystemExit("usage: python run.py +preprocess=<file> [overrides]")
    globals()[cfg.type](cfg)


if __name__ == "__main__":
    main()
