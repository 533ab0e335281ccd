"""Diagnose the overfit-e2e accuracy chain (VERDICT r2 Missing #1).

Loads the trained checkpoint + SfM annotation from an overfit_e2e workdir and
evaluates the matcher on BOTH the mapped sequence (toy-1, seen in training)
and the held-out one (toy-2). For every frame it reports:

  * number of predicted matches (mask sum) and mean confidence
  * coarse precision: fraction of matches whose predicted cell equals the
    GT projection cell of the matched 3D point (reference supervision
    semantics, src/datasets/OnePosePlus_dataset.py:341-444)
  * fine reprojection error of predicted 2D points vs GT-projected 3D points
  * PnP result (R/t errors, inliers)

This separates: training failure (train seq matches wrong) vs generalization
failure (train good / test bad) vs inference-path mismatch (matches good /
PnP bad).

Usage: python scripts/diagnose_overfit.py [--workdir /tmp/overfit_e2e]
           [--img 128] [--shape3d 512]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def frame_records(seq_dir):
    sys.path.insert(0, REPO)
    from inference import sequence_records

    return sequence_records(seq_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/overfit_e2e")
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--shape3d", type=int, default=512)
    ap.add_argument("--thr", type=float, default=1e-4)
    ap.add_argument("--obj", default="0001-toy-box")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument(
        "--out",
        default=None,
        help="write the mapped-vs-held-out diagnosis table as JSON "
        "(per-frame rows + per-sequence means) — the committable artifact "
        "form of this report",
    )
    ap.add_argument(
        "--tpu",
        action="store_true",
        help="diagnose the PRODUCTION model/checkpoint on the chip (full "
        "architecture, bf16; --img 512 --shape3d 7000) instead of the "
        "reduced CPU prototype",
    )
    args = ap.parse_args()

    import jax

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        # jax is pre-imported by the environment's sitecustomize (axon TPU
        # platform); rebind to CPU on the live config or ops block on tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from onepose_plus_plus_tpu.data.dataset import OnePosePlusInferenceDataset
    from onepose_plus_plus_tpu.data.preprocessing import pad_point_cloud
    from onepose_plus_plus_tpu.geometry.pnp import ransac_pnp
    from onepose_plus_plus_tpu.eval.metrics import batched_pose_errors
    from onepose_plus_plus_tpu.models.build import build_onepose_model
    from onepose_plus_plus_tpu.utils import load_checkpoint

    if args.tpu:
        # the production architecture the TPU chain trains (no structural
        # overrides — the checkpoint must load back identically)
        model_overrides = {"match_coarse": {"thr": args.thr}}
    else:
        model_overrides = {
            "loftr_coarse": {"layer_iter_n": 2},
            "match_coarse": {
                "max_matches": 256,
                "train_max_matches": 256,
                "train_pad_num_gt_min": 32,
                "thr": args.thr,
            },
            "compute_dtype": "float32",
        }
    model = build_onepose_model(model_overrides)
    ckpt = args.ckpt or os.path.join(args.workdir, "ckpts", "overfit", "last")
    variables = load_checkpoint(ckpt)

    anno_path = os.path.join(
        args.workdir, "sfm_outputs", args.obj, "anno", "anno_3d_average.npz"
    )
    data_dir = os.path.join(args.workdir, "data", args.obj)

    report = {}
    seq_base = args.obj.split("-", 1)[1].split("-")[0]
    for seq in sorted(glob.glob(os.path.join(data_dir, f"{seq_base}-*"))):
        recs = frame_records(seq)
        ds = OnePosePlusInferenceDataset(anno_path, recs, img_size=args.img)
        gen = np.random.default_rng(0)
        pc = pad_point_cloud(
            ds.annotation["keypoints3d"],
            ds.annotation["descriptors3d"],
            ds.annotation.get("scores3d"),
            args.shape3d,
            gen,
        )
        batch_pc = {
            "keypoints3d": jnp.asarray(pc["keypoints3d"])[None],
            "descriptors3d": jnp.asarray(pc["descriptors3d"])[None],
        }
        if "descriptors3d_coarse" in ds.annotation:
            cc = pad_point_cloud(
                ds.annotation["keypoints3d"],
                ds.annotation["descriptors3d_coarse"],
                ds.annotation.get("scores3d_coarse"),
                args.shape3d,
                np.random.default_rng(0),
            )
            batch_pc["descriptors3d_coarse"] = jnp.asarray(cc["descriptors3d"])[None]

        print(f"\n=== {os.path.basename(seq)} ({len(ds)} frames) ===")
        report[os.path.basename(seq)] = seq_report = {"frames": []}
        stride = 8
        s_grid = args.img // stride
        agg = dict(nm=[], prec=[], reproj=[], R=[], t=[], inl=[])

        # jit the forward: un-jitted apply dispatches op-by-op, which over
        # the axon tunnel is one round-trip per op (minutes per frame)
        fwd = jax.jit(lambda b: model.apply(variables, b, train=False))
        for fi in range(len(ds)):
            f = ds[fi]
            batch = dict(batch_pc)
            batch["query_image"] = jnp.asarray(f["image"])[None, ..., None]
            out = fwd(batch)
            mask = np.asarray(out["match_mask"][0]).astype(bool)
            i_ids = np.asarray(out["i_ids"][0])
            mk3d = np.asarray(out["mkpts_3d"][0])
            mk2d = np.asarray(out["mkpts_query_f"][0])
            j_ids = np.asarray(out["j_ids"][0])
            conf = np.asarray(out["mconf"][0])

            # GT projection of the matched 3D points
            T, K = f["pose_gt"], f["K"]
            pcam = mk3d @ T[:3, :3].T + T[:3, 3]
            uv = (pcam @ K.T)
            uv = uv[:, :2] / np.clip(uv[:, 2:3], 1e-6, None)
            gt_cell = (
                np.round(uv[:, 1] / stride).astype(int) * s_grid
                + np.round(uv[:, 0] / stride).astype(int)
            )
            nm = int(mask.sum())
            # fraction of matches hitting REAL SfM points (padded fake slots
            # occupy indices >= n_real and have zero descriptors — a high
            # fake fraction means the confidence is latching onto padding)
            n_real = ds.annotation["keypoints3d"].shape[0]
            freal = float((i_ids[mask] < n_real).mean()) if nm else 0.0
            prec = float((gt_cell[mask] == j_ids[mask]).mean()) if nm else 0.0
            reproj = (
                float(np.linalg.norm(uv[mask] - mk2d[mask], axis=1).mean())
                if nm
                else float("nan")
            )

            res = ransac_pnp(
                jnp.asarray(mk3d),
                jnp.asarray(mk2d),
                jnp.asarray(K),
                jnp.asarray(mask),
                jax.random.PRNGKey(fi),
                reproj_threshold_px=3.3,
                num_hypotheses=128,
            )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = np.asarray(res.R)
            pose[:3, 3] = np.asarray(res.t)
            R_err, t_err = batched_pose_errors(
                jnp.asarray(pose)[None], jnp.asarray(T)[None]
            )
            agg["nm"].append(nm)
            agg.setdefault("freal", []).append(freal)
            agg["prec"].append(prec)
            agg["reproj"].append(reproj)
            agg["R"].append(float(R_err[0]))
            agg["t"].append(float(t_err[0]))
            agg["inl"].append(int(res.num_inliers))
            seq_report["frames"].append(
                {
                    "frame": fi,
                    "matches": nm,
                    "mean_conf": float(conf[mask].mean()) if nm else 0.0,
                    "frac_real_points": freal,
                    "cell_precision": prec,
                    "reproj_px": reproj,
                    "pnp_inliers": int(res.num_inliers),
                    "R_err_deg": float(R_err[0]),
                    "t_err_cm": float(t_err[0]),
                }
            )
            print(
                f"  f{fi:02d}: matches={nm:4d} conf={conf[mask].mean() if nm else 0:.3f} "
                f"real={freal:.2f} prec={prec:.2f} reproj={reproj:6.1f}px "
                f"PnP inl={int(res.num_inliers):4d} R={float(R_err[0]):7.2f}deg "
                f"t={float(t_err[0]):7.2f}cm"
            )
        seq_report["mean"] = {
            "matches": float(np.mean(agg["nm"])),
            "frac_real_points": float(np.mean(agg["freal"])),
            "cell_precision": float(np.mean(agg["prec"])),
            "reproj_px": float(np.nanmean(agg["reproj"])),
            "R_err_deg": float(np.mean(agg["R"])),
            "t_err_cm": float(np.mean(agg["t"])),
            "five_cm_five_deg": float(
                np.mean((np.array(agg["R"]) < 5) & (np.array(agg["t"]) < 5))
            ),
        }
        print(
            f"  mean: matches={np.mean(agg['nm']):.0f} "
            f"real={np.mean(agg['freal']):.2f} prec={np.mean(agg['prec']):.2f} "
            f"reproj={np.nanmean(agg['reproj']):.1f}px R={np.mean(agg['R']):.1f}deg "
            f"t={np.mean(agg['t']):.1f}cm "
            f"5cm5deg={seq_report['mean']['five_cm_five_deg']:.2f}"
        )
    if args.out:
        import json

        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(
                {
                    "workdir": args.workdir,
                    "img": args.img,
                    "shape3d": args.shape3d,
                    "thr": args.thr,
                    "sequences": report,
                },
                fh,
                indent=1,
            )
        print("diagnosis table ->", args.out)


if __name__ == "__main__":
    main()
