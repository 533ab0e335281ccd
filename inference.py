"""Evaluation CLI — `python inference.py +experiment=inference_onepose.yaml`.

CLI-parity entry point for reference ``inference.py``: per-object evaluation
of the 2D-3D matcher + PnP against GT poses, aggregated to ``metrics.txt``.
Frames stream through the fused batched match+PnP device step
(:mod:`onepose_plus_plus_tpu.inference.pipeline`) instead of per-frame Ray
workers.
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

from onepose_plus_plus_tpu.data.dataset import (
    FrameRecord,
    OnePosePlusInferenceDataset,
)
from onepose_plus_plus_tpu.eval.metrics import aggregate_metrics
from onepose_plus_plus_tpu.inference.pipeline import run_inference
from onepose_plus_plus_tpu.models.build import build_onepose_model
from onepose_plus_plus_tpu.utils import load_checkpoint, load_config

CONFIGS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def discover_eval_objects(
    data_dir: str,
    sfm_dir: str,
    ids=None,
    exception_obj_names=(),
    top_k_obj=None,
    num_val_seq=None,
):
    """Objects with test sequences and an SfM annotation.

    Mirrors the reference discovery (``/root/reference/inference.py:22-81``):
    objects are ``XXXX-name`` dirs, optionally restricted to the configured
    test-split ``ids`` (matched on the 4-char id prefix) minus
    ``exception_obj_names``; per object the evaluated sequences are every
    ``name-seq`` dir (excluding ``-demo``), or only the LAST ``num_val_seq``
    of them when set (reference ``num_val_seq: 1``).
    """
    names = sorted(os.listdir(data_dir)) if os.path.isdir(data_dir) else []
    names = [n for n in names[top_k_obj:] if "-" in n]
    if ids:
        id2full = {n[:4]: n for n in names}
        names = [id2full[i] for i in ids if i in id2full]
    exception_obj_names = {e for e in (exception_obj_names or ()) if e}
    out = []
    for base in names:
        if base in exception_obj_names:
            continue
        obj_dir = os.path.join(data_dir, base)
        anno = os.path.join(sfm_dir, base, "anno", "anno_3d_average.npz")
        if not (os.path.isdir(obj_dir) and os.path.exists(anno)):
            continue
        seqs = [
            s
            for s in sorted(glob.glob(os.path.join(obj_dir, "*")))
            if os.path.isdir(os.path.join(s, "color"))
            and "-" in os.path.basename(s)
            and "-demo" not in os.path.basename(s)
        ]
        if num_val_seq:
            seqs = seqs[-int(num_val_seq):]
        if seqs:
            out.append((base, seqs, anno))
    return out


def sequence_records(seq_dir: str):
    recs = []
    for f in sorted(
        glob.glob(os.path.join(seq_dir, "color", "*.png"))
        + glob.glob(os.path.join(seq_dir, "color", "*.jpg"))
    ):
        stem = os.path.splitext(os.path.basename(f))[0]
        pose_p = os.path.join(seq_dir, "poses_ba", stem + ".txt")
        intr_p = os.path.join(seq_dir, "intrin_ba", stem + ".txt")
        if not os.path.exists(intr_p):
            intr_p = os.path.join(seq_dir, "intrin", stem + ".txt")
        if not os.path.exists(intr_p):
            continue
        rec = FrameRecord(
            img_file=f, K=np.loadtxt(intr_p).reshape(3, 3)
        )
        if os.path.exists(pose_p):
            rec.pose = np.loadtxt(pose_p).reshape(4, 4)
        recs.append(rec)
    return recs


def inference(cfg) -> None:
    import jax

    objects = discover_eval_objects(
        cfg.dataset.data_dir,
        cfg.dataset.sfm_outputs_dir,
        ids=cfg.get("ids"),
        exception_obj_names=cfg.get("exception_obj_names") or (),
        top_k_obj=cfg.get("top_k_obj"),
        num_val_seq=cfg.get("num_val_seq"),
    )
    if not objects:
        print(f"no evaluable objects under {cfg.dataset.data_dir}")
        return
    # early startup line: proves the process got past jax backend init (the
    # axon relay dial can deadlock a child at interpreter start) and shows
    # the evaluation scope before the first — possibly multi-minute — compile
    print(
        f"evaluating {len(objects)} object(s) on "
        f"{[d.platform for d in jax.devices()]}: "
        f"{[o[0] for o in objects]}",
        flush=True,
    )

    model = build_onepose_model(dict(cfg.get("model", {}) or {}))
    weights_path = cfg.get_path("network.onepose_weights")
    variables = None

    out_dir = cfg.get("output_dir", "results")
    os.makedirs(out_dir, exist_ok=True)
    all_R, all_t, per_object = [], [], {}
    step = None  # shared compiled match+PnP step across objects

    # per-action host profiler (reference build_profiler registry surface:
    # none|simple|advanced|chrome); device traces via utils.profiling.trace
    from onepose_plus_plus_tpu.utils.profiling import build_profiler

    profiler = build_profiler(cfg.get("profiler_name"))

    for obj_name, seqs, anno_path in objects:
        # evaluate every selected test sequence, pooled per object
        # (reference data_dirs = "obj_dir seq1 seq2 ...", inference.py:75-78)
        records = [r for s in seqs for r in sequence_records(s)]
        ds = OnePosePlusInferenceDataset(
            anno_path, records, img_size=cfg.dataset.img_resize
        )
        if variables is None:
            if weights_path:
                variables = load_checkpoint(weights_path)
            else:
                print("WARNING: no onepose_weights — random-weight model")
                f0 = ds[0]
                s3d = cfg.dataset.shape3d
                probe = {
                    "query_image": np.zeros(
                        (1, cfg.dataset.img_resize, cfg.dataset.img_resize, 1),
                        np.float32,
                    ),
                    "keypoints3d": np.zeros((1, s3d, 3), np.float32),
                    "descriptors3d": np.zeros((1, s3d, 128), np.float32),
                    "descriptors3d_coarse": np.zeros((1, s3d, 256), np.float32),
                }
                variables = model.init(jax.random.PRNGKey(666), probe, train=False)
        if step is None:
            from onepose_plus_plus_tpu.inference.pipeline import make_query_step

            step = make_query_step(
                model,
                variables,
                reproj_threshold_px=cfg.eval_metrics.pnp_reproj_thr,
                num_hypotheses=cfg.inference.num_hypotheses,
                p3p_samples=int(cfg.inference.get("p3p_samples", 128)),
            )
        with profiler.record(f"inference/{obj_name}"):
            res = run_inference(
                model,
                variables,
                ds.frames(),
                ds.annotation,
                shape3d=cfg.dataset.shape3d,
                frame_batch=cfg.inference.frame_batch,
                reproj_threshold_px=cfg.eval_metrics.pnp_reproj_thr,
                num_hypotheses=cfg.inference.num_hypotheses,
                pose_thresholds=tuple(cfg.eval_metrics.pose_thresholds),
                step=step,
            )
        # ADD(S)-0.1d + proj2D metrics against a CAD model (LINEMOD path,
        # reference inference_LINEMOD.yaml: eval_ADD_metric)
        if cfg.get_path("eval_metrics.eval_ADD_metric") and res.R_errs is not None:
            from onepose_plus_plus_tpu.eval import (
                SYMMETRIC_OBJ_IDS,
                add_metric,
                load_cad_for_eval,
                projection_2d_error,
            )

            cad_dir = cfg.get_path("cad.cad_models_dir", cfg.get_path("dataset.cad_models_dir", ""))
            obj_id = obj_name.split("-")[0]
            cad_path = os.path.join(cad_dir, f"{obj_name}.ply")
            if not os.path.exists(cad_path):
                cad_path = os.path.join(cad_dir, f"{obj_id}.ply")
            if os.path.exists(cad_path):
                model_pts, diameter = load_cad_for_eval(
                    cad_path,
                    unit_scale=cfg.get_path(
                        "cad.cad_unit_scale",
                        cfg.get_path("dataset.cad_unit_scale", 1.0),
                    ),
                )
                symmetric = obj_id in SYMMETRIC_OBJ_IDS
                add_flags, proj_flags = [], []
                for fi, f in enumerate(ds.frames()):
                    if "pose_gt" not in f:
                        continue
                    add_flags.append(
                        add_metric(
                            res.poses[fi], f["pose_gt"], model_pts, diameter,
                            symmetric=symmetric,
                        )
                    )
                    proj_flags.append(
                        projection_2d_error(
                            res.poses[fi], f["pose_gt"], model_pts, f["K"]
                        )
                    )
                res.metrics = aggregate_metrics(
                    res.R_errs,
                    res.t_errs,
                    add_flags=add_flags,
                    proj2d_flags=proj_flags,
                    pose_thresholds=tuple(cfg.eval_metrics.pose_thresholds),
                )
        per_object[obj_name] = res.metrics
        if res.R_errs is not None:
            all_R.extend(res.R_errs.tolist())
            all_t.extend(res.t_errs.tolist())
            # per-frame error dump for threshold/diagnosis work (reference
            # keeps only aggregates; frame ids follow the pooled seq order)
            with open(os.path.join(out_dir, f"errors_{obj_name}.json"), "w") as f:
                json.dump(
                    {
                        "frames": [r.img_file for r in records],
                        "R_errs_deg": np.asarray(res.R_errs).tolist(),
                        "t_errs_cm": np.asarray(res.t_errs).tolist(),
                        "num_inliers": np.asarray(res.num_inliers).tolist()
                        if res.num_inliers is not None
                        else None,
                        # confident matches fed to PnP: separates "matcher
                        # found nothing off the mapped ring" (low) from
                        # "matches present but mis-posed" (high + low inliers)
                        "num_matches": np.asarray(res.num_matches).tolist()
                        if res.num_matches is not None
                        else None,
                    },
                    f,
                    indent=1,
                )
        print(f"[{obj_name}] {len(ds)} frames: {res.metrics}")

    summary = aggregate_metrics(
        all_R, all_t, pose_thresholds=tuple(cfg.eval_metrics.pose_thresholds)
    )
    # per-metric means over objects (reference gathered_metrics,
    # inference.py:108-135) + the reference metrics.txt block layout
    gathered = {}
    for m in per_object.values():
        for k, v in (m or {}).items():
            gathered.setdefault(k, []).append(v)
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        for obj, m in per_object.items():
            f.write(f"{obj}: \n")
            for k, v in (m or {}).items():
                f.write(f"{k}: {v}  ")
            f.write("\n ---------------- \n")
        f.write("Summary: \n")
        for k, vs in gathered.items():
            f.write(f"{k}: {float(np.mean(vs))}\n")
        f.write(f"ALL: {json.dumps(summary)}\n")
    print("ALL:", summary)
    ps = profiler.summary()
    if ps:
        print(ps)


def main() -> None:
    cfg = load_config(CONFIGS_DIR, sys.argv[1:])
    if cfg.get("type") is None:
        raise SystemExit("usage: python inference.py +experiment=<file> [overrides]")
    globals()[cfg.type](cfg)


if __name__ == "__main__":
    main()
