"""Closed-loop accuracy experiment: train the matcher on a mapped object,
then evaluate pose accuracy on held-out views with the TRAINED weights.

Every metrics.txt recorded so far used random-init weights (no released
checkpoint exists in this environment), so pose accuracy was structurally 0.
This script produces the framework's first non-vacuous accuracy numbers by
closing the reference's own loop (SURVEY.md §3.1→3.4→3.2) on one object:

    1. render a synthetic OnePose-format object as TWO sequences over one
       textured plane (toy-1 = mapping/training views, toy-2 = held-out test
       views, interleaved on the camera ring)
    2. run.py            — keypoint-free SfM on toy-1 -> 3D annotations
    3. merge.py          — COCO-style training annotations from the SfM model
    4. train_onepose_plus.py — overfit the 2D-3D matcher on toy-1
    5. inference.py      — evaluate 1/3/5cm@deg on toy-2 with the trained ckpt

Snapshot lands in artifacts/overfit_e2e[_tpu]/. CPU mode shrinks the model
and resolution to prototype the chain; --tpu runs the production config.

Usage: python scripts/overfit_e2e.py [--frames-per-seq 24] [--img 256]
           [--epochs 40] [--tpu]
"""
import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from record_e2e import run_cli  # noqa: E402  (same CLI env handling)


def build_object(data_dir, obj, seq_names, frames_per_seq, img, rng, half=0.2):
    """Textured-cube render: sequences interleave camera-ring positions so
    test views sit between training views. The cube replaces round 2's
    single textured plane — that scene was doubly degenerate (all SfM points
    coplanar -> planar PnP ambiguity; ring cameras at +/-90deg viewed the
    plane edge-on), which is what zeroed every metrics.txt."""
    from synthetic_scenes import make_cube_scene_object

    make_cube_scene_object(
        data_dir, obj, seq_names, frames_per_seq, img, rng, half=half
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-seq", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--shape3d",
        type=int,
        default=None,
        help="matcher point-cloud capacity (CPU default 128: the 24-frame "
        "128px cube SfM yields ~60 points, so 512 slots were ~88%% random "
        "fake-point padding diluting the dual-softmax — fewer slots = "
        "denser supervision and ~2x faster steps)",
    )
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--eval-thr", type=float, default=0.1)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument(
        "--objects",
        type=int,
        default=1,
        help="number of synthetic objects (distinct textures/sizes). >1 "
        "exercises the reference's multi-object surface end-to-end: one "
        "merged train json across objects (merge.py), one training run, and "
        "ONE inference.py invocation looping all objects through the shared "
        "compiled step with per-object metrics + aggregate summary "
        "(reference inference.py:20-209 object loop)",
    )
    ap.add_argument(
        "--train-chunk",
        type=int,
        default=None,
        help="max epochs per training PROCESS (TPU default 40, CPU off). The "
        "axon tunnel client leaks ~1x the uploaded bytes of HOST memory per "
        "device_put (measured: 46 MB RSS per 45 MB upload, never freed), so "
        "a long on-chip training run accumulates ~45 MB x steps and the OOM "
        "killer takes it out around 2900 steps on this 125 GB host. Chunking "
        "restarts the process every N epochs via the trainer's own "
        "resume-from-last_state path; results are bit-identical to one run "
        "(epoch-derived rng, restored opt state)",
    )
    ap.add_argument(
        "--no-warp-all",
        action="store_true",
        help="keep the reference image_warp_adapt semantics (static originals"
        " + warped copies). Default warps BOTH halves with independent"
        " epoch-fresh homographies: with only ~24 static mapping views the"
        " unwarped half is a positional-encoding view-lookup shortcut"
        " (epoch-40 diagnosis: 0.96 mapped vs 0.04 held-out 5cm@5deg)",
    )
    ap.add_argument(
        "--keep-workdir",
        action="store_true",
        help="reuse an existing workdir after a tunnel-outage kill: data "
        "rendering is skipped, cached SfM stages are reused (overwrite "
        "false), and training resumes from the last checkpoint",
    )
    ap.add_argument(
        "--artifact-name",
        default=None,
        help="override the artifacts/<name> destination (e.g. record a "
        "reference-warp-semantics control run without clobbering the "
        "flagship overfit_e2e_tpu artifact)",
    )
    ap.add_argument(
        "--prep-only",
        action="store_true",
        help="stop after run.py+merge.py (populate the workdir for "
        "scripts/train_parity.py without the training/inference stages)",
    )
    ap.add_argument(
        "--linemod",
        action="store_true",
        help="LINEMOD-shaped chain (reference inference_LINEMOD.yaml): 256^2"
        " crops, sfm_inference_LINEMOD preprocess, ADD(S)-0.1d + proj2D@5px"
        " metrics against generated CAD plys; object ids include the"
        " symmetric 0810 (eggbox) to exercise ADD-S",
    )
    ap.add_argument(
        "--no-warp-adapt",
        action="store_true",
        help="disable the homography warp doubling (reference image_warp_adapt;"
        " without it the matcher memorizes mapped views and held-out accuracy"
        " collapses — per-frame R errors snap to wrong ring positions)",
    )
    args = ap.parse_args()
    tpu = args.tpu
    frames = args.frames_per_seq or (24 if tpu else 24)
    img = args.img or (256 if args.linemod else (512 if tpu else 128))
    epochs = args.epochs or (150 if tpu else 200)
    workdir = args.workdir or ("/tmp/overfit_e2e_tpu" if tpu else "/tmp/overfit_e2e")

    if args.linemod:
        # 0810 = eggbox (SYMMETRIC_OBJ_IDS): exercises the ADD-S closest-point
        # variant; the others take the plain ADD path
        obj_names = ["0810-eggbox", "0801-ape", "0805-can"][: args.objects]
    else:
        obj_names = ["0001-toy-box", "0002-toy-crate", "0003-toy-die"][: args.objects]
    halves = [0.2, 0.15, 0.25]
    data_dir = os.path.join(workdir, "data")
    sfm_dir = os.path.join(workdir, "sfm_outputs")
    out_dir = os.path.join(workdir, "results")
    ckpt_dir = os.path.join(workdir, "ckpts")
    if not args.keep_workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    cad_dir = os.path.join(workdir, "cad_models")
    for oi, obj in enumerate(obj_names):
        if args.keep_workdir and os.path.isdir(os.path.join(data_dir, obj)):
            continue
        seq_base = obj.split("-", 1)[1].split("-")[0]
        build_object(
            data_dir,
            obj,
            (f"{seq_base}-1", f"{seq_base}-2"),
            frames,
            img,
            np.random.default_rng(oi),
            half=halves[oi % len(halves)],
        )
        if args.linemod:
            # CAD model matching the rendered cube (mm units, like BOP
            # models/): dense samples on the 6 faces -> ascii ply
            from onepose_plus_plus_tpu.utils.visualization import save_ply

            h_mm = halves[oi % len(halves)] * 1000.0
            lin = np.linspace(-h_mm, h_mm, 16)
            u, v = np.meshgrid(lin, lin)
            u, v = u.ravel(), v.ravel()
            faces = []
            for ax in range(3):
                for sgn in (-h_mm, h_mm):
                    p = np.zeros((len(u), 3))
                    p[:, ax] = sgn
                    p[:, (ax + 1) % 3] = u
                    p[:, (ax + 2) % 3] = v
                    faces.append(p)
            save_ply(
                os.path.join(cad_dir, f"{obj.split('-')[0]}.ply"),
                np.concatenate(faces).astype(np.float32),
            )

    # small-model overrides shared by train + inference (checkpoint must
    # load back into the identical architecture); TPU runs the full model
    model_ov = (
        []
        if tpu
        else [
            "model.loftr_coarse.layer_iter_n=2",
            "model.match_coarse.max_matches=256",
            "model.match_coarse.train_max_matches=256",
            "model.match_coarse.train_pad_num_gt_min=32",
            "model.compute_dtype=float32",
        ]
    )
    shape3d = args.shape3d or (7000 if tpu else 128)
    lr = args.lr or (None if tpu else 1e-3)
    # trained-model confidence threshold: the reference evaluates at 0.1
    # (configs/experiment/inference_onepose.yaml:70). The old 1e-4 here was a
    # random-init relic — with a CONVERGED matcher it floods PnP with
    # unsupervised-row junk (25% inlier fraction, round-3 diagnostics)
    thr_ov = f"model.match_coarse.thr={args.eval_thr}"

    sfm_preset = "sfm_inference_LINEMOD" if args.linemod else "sfm_inference_onepose"
    run_cli(
        "run.py",
        [
            f"+preprocess={sfm_preset}",
            "ids=null",
            f"dataset.data_dir={data_dir}",
            f"dataset.outputs_dir={sfm_dir}",
            "dataset.down_ratio=1",
            f"sfm.pair_batch={8 if tpu else 4}",
            f"sfm.covis_num={10 if tpu else 8}",
            "sfm.max_epipolar_error_px=8.0",
            "model.match_coarse.thr=1e-6",  # random-init SfM: diffuse conf
        ]
        + ([] if tpu else ["model.compute_dtype=float32"]),
        tpu=tpu,
    )
    train_json = os.path.join(workdir, "train_anno.json")
    run_cli(
        "merge.py",
        [
            "+preprocess=merge_anno",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.out_train_file={train_json}",
            "dataset.out_val_file=null",
        ],
        tpu=tpu,
    )
    if args.prep_only:
        print("prep-only: workdir populated ->", workdir)
        return
    exp = "overfit"
    chunk = args.train_chunk if args.train_chunk is not None else (40 if tpu else 0)
    done = 0
    have_ckpt = os.path.exists(os.path.join(ckpt_dir, exp, "last_state"))
    while done < epochs:
        upto = min(done + chunk, epochs) if chunk else epochs
        run_cli(
            "train_onepose_plus.py",
            [
                "+experiment=train",
                f"exp_name={exp}",
                f"dataset.train_anno_file={train_json}",
                f"dataset.img_resize={img}",
                f"dataset.shape3d_train={shape3d}",
                f"dataset.image_warp_adapt={'false' if args.no_warp_adapt else 'true'}",
                f"dataset.image_warp_all={'false' if (args.no_warp_all or args.no_warp_adapt) else 'true'}",
                "dataset.val_anno_file=null",
                f"trainer.epochs={upto}",
                f"trainer.batch_size={4 if tpu else 1}",
                "trainer.grad_accum=1",
                f"trainer.n_devices={1 if tpu else 4}",
                "trainer.log_every_n_steps=20",
                "trainer.enable_plotting=false",
                # overfit: constant LR (no decay milestones inside the budget);
                # CPU prototype runs hotter to converge inside the wall budget
                "trainer.milestones=[1000]",
                *([f"trainer.canonical_lr={lr}"] if lr else []),
                *(
                    ["trainer.resume=true"]
                    if (done or (args.keep_workdir and have_ckpt))
                    else []
                ),
                f"ckpt_dir={ckpt_dir}",
                f"log_dir={os.path.join(workdir, 'logs')}",
            ]
            + model_ov,
            tpu=tpu,
            timeout=6 * 3600,  # the 128px/80-epoch CPU training runs ~2h
        )
        done = upto
    weights = os.path.join(ckpt_dir, exp, "last")
    inf_preset = "inference_LINEMOD" if args.linemod else "inference_onepose"
    cad_ov = (
        [f"cad.cad_models_dir={cad_dir}", "cad.cad_unit_scale=0.001"]
        if args.linemod
        else []
    )
    run_cli(
        "inference.py",
        [
            f"+experiment={inf_preset}",
            "ids=null",
            f"dataset.data_dir={data_dir}",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.img_resize={img}",
            f"dataset.shape3d={shape3d}",
            "num_val_seq=1",  # evaluate the held-out toy-2 only
            f"network.onepose_weights={weights}",
            f"inference.frame_batch={8 if tpu else 4}",
            thr_ov,
            f"output_dir={out_dir}",
        ]
        + model_ov
        + cad_ov
        + ([] if tpu else ["inference.num_hypotheses=128"]),
        tpu=tpu,
    )

    base = "overfit_e2e_tpu" if tpu else "overfit_e2e"
    if args.objects > 1:
        base = f"multi_object_{'tpu' if tpu else 'cpu'}"
    if args.linemod:
        base = f"linemod_{'tpu' if tpu else 'cpu'}"
    if args.artifact_name:
        base = args.artifact_name
    art = os.path.join(REPO, "artifacts", base)
    os.makedirs(art, exist_ok=True)
    shutil.copy(os.path.join(out_dir, "metrics.txt"), os.path.join(art, "metrics.txt"))
    import glob

    for ej in glob.glob(os.path.join(out_dir, "errors_*.json")):
        shutil.copy(ej, os.path.join(art, os.path.basename(ej)))
    metrics = open(os.path.join(out_dir, "metrics.txt")).read()
    meta = {
        "hardware": "TPU v5e (1 chip, axon tunnel), bf16"
        if tpu
        else "CPU (4 virtual devices), f32, reduced model",
        "scene": {
            "objects": obj_names,
            "frames_per_seq": frames,
            "img": img,
            "train_seq": "<obj>-1",
            "test_seq": "<obj>-2 (held-out interleaved views)",
        },
        "epochs": epochs,
        "image_warp_adapt": not args.no_warp_adapt,
        "image_warp_all": not (args.no_warp_all or args.no_warp_adapt),
        "linemod": bool(args.linemod),
        "pipeline": ["run.py", "merge.py", "train_onepose_plus.py", "inference.py"],
        "weights": "trained in-loop by this script (no released ckpt exists here)",
    }
    json.dump(meta, open(os.path.join(art, "meta.json"), "w"), indent=1)
    print(metrics)
    print("artifacts ->", art)


if __name__ == "__main__":
    main()
