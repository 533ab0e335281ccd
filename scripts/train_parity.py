"""Side-by-side training parity: reference torch model vs the JAX model.

VERDICT r2 Missing #2: nothing trained the importable reference
``OnePosePlus_model`` next to the JAX model on identical data, so a 0.0
pose-accuracy result could not be attributed to a framework bug vs. task
hardness. This script closes that gap:

  * both models start from the SAME weights (torch init converted with
    ``convert_torch_state_dict(strict=True)``),
  * both consume byte-identical training samples (our
    ``OnePosePlusTrainDataset`` output; the torch side gets the dense
    ``conf_matrix_gt`` / ``fine_location_matrix_gt`` adapter of our sparse
    ``gt_cell`` / ``gt_fine_xy`` — same construction as the reference dataset,
    ``src/datasets/OnePosePlus_dataset.py:174-231``),
  * both step AdamW(lr, wd=0.1) at constant LR, batch 1, identical epoch
    shuffles,
  * the torch side runs the reference's own training surface: forward →
    ``fine_supervision`` (``src/models/OnePosePlus/utils/fine_supervision.py``)
    → ``Loss`` (``src/lightning_model/losses.py:7-142``) → backward,
  * after training, both are evaluated on the held-out sequence with the SAME
    RANSAC-PnP (ours), isolating the learned matcher.

Outputs artifacts/train_parity/curves.json + summary.json. Interpretation:
curves diverging ⇒ framework bug on whichever side stalls; both converging
and both posing (or both failing) ⇒ parity at toy scale.

Requires a populated overfit workdir (scripts/overfit_e2e.py builds it):
    python scripts/overfit_e2e.py            # once, populates /tmp/overfit_e2e
    python scripts/train_parity.py [--epochs 20]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# --tpu runs the JAX side on the chip (fast iteration with --no-torch); the
# default pins CPU for bit-comparable numerics vs torch. The pin must happen
# before any jax use: the environment's sitecustomize pre-imports jax bound to
# the TPU relay, so the env var alone is too late — rebind the platform on the
# live config (tunnel down = any axon-dispatched op blocks forever).
if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
else:
    import jax  # noqa: E402


def dense_gt(sample, img, stride=8):
    """Sparse gt_cell/gt_fine_xy -> reference dense GT matrices."""
    s_grid = img // stride
    n_cells = s_grid * s_grid
    gt_cell = sample["gt_cell"]  # [S]
    S = gt_cell.shape[0]
    conf = np.zeros((S, n_cells), np.float32)
    fine = np.full((S, n_cells, 2), -50.0, np.float32)
    rows = np.flatnonzero(gt_cell >= 0)
    conf[rows, gt_cell[rows]] = 1.0
    fine[rows, gt_cell[rows]] = sample["gt_fine_xy"][rows]
    return conf, fine


def torch_batch(sample, img):
    import torch

    conf, fine = dense_gt(sample, img)
    return {
        "query_image": torch.from_numpy(
            sample["query_image"].transpose(2, 0, 1)[None]
        ),
        "query_image_scale": torch.ones(1, 2),
        "keypoints3d": torch.from_numpy(sample["keypoints3d"][None]),
        "descriptors3d_db": torch.from_numpy(
            sample["descriptors3d"].T[None].copy()
        ),
        "descriptors3d_coarse_db": torch.from_numpy(
            sample["descriptors3d_coarse"].T[None].copy()
        ),
        "conf_matrix_gt": torch.from_numpy(conf[None]),
        "fine_location_matrix_gt": torch.from_numpy(fine[None]),
    }


def jax_batch(sample):
    import jax.numpy as jnp

    return {
        "query_image": jnp.asarray(sample["query_image"])[None],
        "keypoints3d": jnp.asarray(sample["keypoints3d"])[None],
        "descriptors3d": jnp.asarray(sample["descriptors3d"])[None],
        "descriptors3d_coarse": jnp.asarray(sample["descriptors3d_coarse"])[None],
        "gt_cell": jnp.asarray(sample["gt_cell"])[None],
        "gt_fine_xy": jnp.asarray(sample["gt_fine_xy"])[None],
    }


_PNP_JIT = None


def eval_pose_errors(mk3d, mk2d, mask, K, pose_gt, seed):
    """Shared RANSAC-PnP + R/t errors (isolates the matcher under test)."""
    import functools

    import jax
    import jax.numpy as jnp

    from onepose_plus_plus_tpu.eval.metrics import batched_pose_errors
    from onepose_plus_plus_tpu.geometry.pnp import ransac_pnp

    global _PNP_JIT
    if _PNP_JIT is None:
        # jit once: un-jitted ransac_pnp dispatches hundreds of tiny ops,
        # each paying the axon tunnel RTT under --tpu
        _PNP_JIT = jax.jit(
            functools.partial(
                ransac_pnp, reproj_threshold_px=3.3, num_hypotheses=128
            )
        )
    res = _PNP_JIT(
        jnp.asarray(mk3d),
        jnp.asarray(mk2d),
        jnp.asarray(K),
        jnp.asarray(mask),
        jax.random.PRNGKey(seed),
    )
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(res.R)
    pose[:3, 3] = np.asarray(res.t)
    R_err, t_err = batched_pose_errors(
        jnp.asarray(pose)[None], jnp.asarray(pose_gt)[None]
    )
    return float(R_err[0]), float(t_err[0]), int(res.num_inliers)


def match_reproj_stats(mk3d, mk2d, mask, K, pose_gt):
    """Residuals of predicted 2D match points vs the GT-pose projection of
    their matched 3D points — separates "matches are wrong" from "PnP is
    wrong" when accuracy is 0 (the round-3 triage instrument)."""
    mask = np.asarray(mask, bool)
    if mask.sum() == 0:
        return {"n": 0}
    X = np.asarray(mk3d)[mask]
    x = np.asarray(mk2d)[mask]
    R, t = pose_gt[:3, :3], pose_gt[:3, 3]
    pc = X @ R.T + t
    uvw = pc @ np.asarray(K).T
    uv = uvw[:, :2] / np.clip(uvw[:, 2:3], 1e-6, None)
    r = np.linalg.norm(uv - x, axis=1)
    return {
        "n": int(mask.sum()),
        "median_px": float(np.median(r)),
        "frac_lt3": float(np.mean(r < 3.0)),
        "frac_lt8": float(np.mean(r < 8.0)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/overfit_e2e")
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--shape3d", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-thr", type=float, default=1e-4)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "train_parity"))
    ap.add_argument(
        "--no-torch",
        action="store_true",
        help="JAX-only fast iteration (random JAX init, no torch training or "
        "eval) — for diagnosing the JAX training loop without the 2x-slower "
        "side-by-side run",
    )
    ap.add_argument(
        "--tpu",
        action="store_true",
        help="run the JAX side on the TPU (use with --no-torch; the CPU pin "
        "exists for bit-comparable torch numerics)",
    )
    ap.add_argument(
        "--warp-adapt",
        action="store_true",
        help="train with epoch-fresh homography warp adaptation on EVERY "
        "sample (image_warp_adapt + image_warp_all, the overfit chain's "
        "view-memorization cure): without it the ~23 static toy images are "
        "memorized via the positional encoding and held-out accuracy stays "
        "0 (round-4 diagnosis). Both sides consume byte-identical warped "
        "samples regenerated per epoch",
    )
    ap.add_argument(
        "--load-params",
        default=None,
        help="skip training; load params.msgpack saved by a previous run and "
        "go straight to evaluation/diagnostics",
    )
    args = ap.parse_args()

    if args.no_torch and args.out == os.path.join(
        REPO, "artifacts", "train_parity"
    ):
        # don't clobber the committed side-by-side artifact with a JAX-only run
        args.out = "/tmp/train_parity_jax_only"

    anno = os.path.join(args.workdir, "train_anno.json")
    if not os.path.exists(anno):
        sys.exit(
            f"{anno} missing — run scripts/overfit_e2e.py first to build the "
            "toy object + SfM annotations"
        )

    use_torch = not args.no_torch
    if use_torch:
        import torch

    import jax
    import jax.numpy as jnp

    if use_torch:
        from reference_stubs import (
            REF_ONEPOSE_CONFIG,
            build_reference_onepose_model,
            install_reference_stubs,
        )

    sys.path.insert(0, REPO)
    from train_onepose_plus import load_records

    # import BEFORE install_reference_stubs() puts /root/reference on
    # sys.path (the reference repo has its own root-level inference.py)
    from inference import sequence_records

    from onepose_plus_plus_tpu.data.dataset import (
        OnePosePlusInferenceDataset,
        OnePosePlusTrainDataset,
    )
    from onepose_plus_plus_tpu.data.preprocessing import pad_point_cloud
    from onepose_plus_plus_tpu.models.build import build_onepose_model
    from onepose_plus_plus_tpu.train.losses import LossConfig, compute_losses
    from onepose_plus_plus_tpu.utils.checkpoint import convert_torch_state_dict

    if use_torch:
        install_reference_stubs()
        from src.lightning_model.losses import Loss as RefLoss  # noqa: E402
        from src.models.OnePosePlus.utils.fine_supervision import (  # noqa: E402
            fine_supervision as ref_fine_supervision,
        )

        torch.manual_seed(0)
        torch.set_num_threads(max(1, os.cpu_count() // 2))

        # ---- matched small-model configs (same as overfit_e2e.py CPU) -----
        ref_cfg = copy.deepcopy(REF_ONEPOSE_CONFIG)
        ref_cfg["loftr_coarse"]["layer_iter_n"] = 2
        # train_max_matches=256 == int(min(S=512, n_cells=256) * 1.0)
        ref_cfg["coarse_matching"]["train"] = {
            "train_padding": True,
            "train_coarse_percent": 1.0,
            "train_pad_num_gt_min": 32,
        }
        ref_model = build_reference_onepose_model(config=ref_cfg)
        ref_model.train()
        ref_loss = RefLoss(
            {
                "coarse_type": "focal",
                "focal_alpha": 0.5,
                "focal_gamma": 2.0,
                "pos_weight": 1.0,
                "neg_weight": 1.0,
                "coarse_weight": 1.0,
                "fine_weight": 0.25,
                "fine_correct_thr": 1.0,
                "fine_type": "l2_with_std",
            }
        )
        ref_sup_cfg = {
            "OnePosePlus": {
                "loftr_backbone": {"resolution": [8, 2]},
                "loftr_fine": {"window_size": 5},
            }
        }

    jx_overrides = {
        "loftr_coarse": {"layer_iter_n": 2},
        "match_coarse": {
            "max_matches": 256,
            "train_max_matches": 256,
            "train_pad_num_gt_min": 32,
            # dense matching path even on TPU: at toy shapes (L=256 cells)
            # the fused streaming kernels compile for ~5 min under Mosaic and
            # win nothing; the dense path compiles in seconds and the
            # log-space loss numerics are identical (production-scale fused
            # parity is pinned by test_tpu_compiled.py)
            "use_fused_kernel": False,
        },
        "compute_dtype": "float32",
    }
    jx_model = build_onepose_model(jx_overrides)
    loss_cfg = LossConfig()

    # ---- identical data ----------------------------------------------------
    records = load_records(anno)
    ds = OnePosePlusTrainDataset(
        records,
        img_size=args.img,
        shape3d=args.shape3d,
        image_warp_adapt=args.warp_adapt,
        image_warp_all=args.warp_adapt,
        seed=0,
    )
    print(f"{len(ds)} training samples from {anno}")
    samples = [ds[i] for i in range(len(ds))]
    usable = [s for s in samples if (s["gt_cell"] >= 0).sum() > 0]
    print(f"{len(usable)} samples with >=1 GT correspondence")

    # ---- same initial weights ----------------------------------------------
    sample0 = usable[0]
    jb0 = jax_batch(sample0)
    # jitted init: un-jitted flax init dispatches thousands of tiny ops — over
    # the axon TPU tunnel that takes minutes (each op pays the relay RTT)
    variables = jax.jit(
        lambda r0, r1, b: jx_model.init(
            {"params": r0, "matching": r1}, b, train=True
        )
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), jb0)
    if use_torch:
        variables, report = convert_torch_state_dict(
            ref_model.state_dict(), variables, strict=True
        )
        assert report["missing"] == [] and report["skipped"] == []
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    import optax

    tx = optax.adamw(args.lr, weight_decay=0.1)
    opt_state = tx.init(params)
    if use_torch:
        ref_opt = torch.optim.AdamW(
            ref_model.parameters(), lr=args.lr, weight_decay=0.1
        )

    @jax.jit
    def jx_step(params, batch_stats, opt_state, batch, rng):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": batch_stats}
            out, updated = jx_model.apply(
                vs, batch, train=True, rngs={"matching": rng}, mutable=["batch_stats"]
            )
            loss, scalars = compute_losses(
                out, batch, loss_cfg, jx_model.cfg.fine.window_size
            )
            return loss, (scalars, updated["batch_stats"])

        grads, (scalars, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, scalars

    def ref_step(sample):
        data = torch_batch(sample, args.img)
        ref_opt.zero_grad()
        ref_model(data)
        ref_fine_supervision(data, ref_sup_cfg)
        ref_loss(data)
        data["loss"].backward()
        ref_opt.step()
        sc = data["loss_scalars"]
        return {k: float(v) for k, v in sc.items()}

    # ---- train loop ----------------------------------------------------------
    import flax.serialization

    curves = {"torch": [], "jax": []}
    order_rng = np.random.default_rng(1234)
    step = 0
    t0 = time.time()
    if args.load_params:
        with open(args.load_params, "rb") as fh:
            restored = flax.serialization.from_bytes(
                {"params": params, "batch_stats": batch_stats}, fh.read()
            )
        params, batch_stats = restored["params"], restored["batch_stats"]
        print(f"loaded params from {args.load_params}; skipping training")
        args.epochs = 0
    n_last = len(usable)
    for epoch in range(args.epochs):
        if args.warp_adapt:
            # epoch-fresh warps: regenerate every sample (both model sides
            # then consume byte-identical warped data for this epoch)
            ds.set_epoch(epoch)
            ep_samples = [ds[i] for i in range(len(ds))]
            ep_usable = [t for t in ep_samples if (t["gt_cell"] >= 0).sum() > 0]
        else:
            ep_usable = usable
        n_last = len(ep_usable)
        order = order_rng.permutation(len(ep_usable))
        ep_t, ep_j = [], []
        for idx in order:
            s = ep_usable[int(idx)]
            if use_torch:
                sc_t = ref_step(s)
                curves["torch"].append(sc_t)
                ep_t.append(sc_t["loss"])
            params, batch_stats, opt_state, sc_j = jx_step(
                params, batch_stats, opt_state, jax_batch(s),
                jax.random.fold_in(jax.random.PRNGKey(7), step),
            )
            sc_j = {k: float(v) for k, v in sc_j.items()}
            curves["jax"].append(sc_j)
            ep_j.append(sc_j["loss"])
            step += 1
        t_part = f"torch loss {np.mean(ep_t):.4f} | " if use_torch else ""
        print(
            f"epoch {epoch:3d}: {t_part}jax loss {np.mean(ep_j):.4f} "
            f"max_conf {np.mean([c['max_conf'] for c in curves['jax'][-n_last:]]):.3f}"
            f"  ({time.time() - t0:.0f}s)",
            flush=True,
        )

    os.makedirs(args.out, exist_ok=True)
    if not args.load_params:
        with open(os.path.join(args.out, "params.msgpack"), "wb") as fh:
            fh.write(
                flax.serialization.to_bytes(
                    {"params": params, "batch_stats": batch_stats}
                )
            )
        print(f"saved params -> {args.out}/params.msgpack")

    # eval model: same params, eval-mode threshold
    jx_eval = build_onepose_model({**jx_overrides, "match_coarse": {
        **jx_overrides["match_coarse"], "thr": args.eval_thr}})
    jx_eval_apply = jax.jit(
        lambda p, bs, b: jx_eval.apply(
            {"params": p, "batch_stats": bs}, b, train=False
        )
    )

    # ---- train-frame diagnostics ----------------------------------------------
    # Runs the EVAL-mode matcher on frames the model was trained on. Three
    # numbers triage a 0.0 held-out metric:
    #   cell_agree — predicted coarse matches landing on that sample's gt_cell
    #     (low ⇒ eval path broken or model did not learn the objective),
    #   reproj median — GT-pose reprojection residual of predicted matches
    #     (small with 0 PnP inliers ⇒ PnP is the bug),
    #   R/t — PnP on memorized frames (good here + bad held-out ⇒ pure
    #     generalization gap, not a framework defect).
    train_diag = []
    for si, s in enumerate(usable[: min(6, len(usable))]):
        out = jx_eval_apply(params, batch_stats, jax_batch(s))
        mask = np.asarray(out["match_mask"][0]).astype(bool)
        i_ids = np.asarray(out["i_ids"][0])[mask]
        j_ids = np.asarray(out["j_ids"][0])[mask]
        gt = s["gt_cell"][i_ids]
        agree = float(np.mean(j_ids == gt)) if mask.sum() else 0.0
        rs = match_reproj_stats(
            np.asarray(out["mkpts_3d"][0]),
            np.asarray(out["mkpts_query_f"][0]),
            mask,
            s["intrinsics"],
            s["pose_gt"],
        )
        Rr, tr, inl = eval_pose_errors(
            np.asarray(out["mkpts_3d"][0]),
            np.asarray(out["mkpts_query_f"][0]),
            mask,
            s["intrinsics"],
            s["pose_gt"],
            1000 + si,
        )
        train_diag.append(
            {"sample": si, "n": int(mask.sum()), "cell_agree": agree,
             "reproj": rs, "R_deg": Rr, "t_cm": tr, "inliers": inl}
        )
        print(
            f"  train s{si:02d}: {int(mask.sum())} m, cell_agree {agree:.2f}, "
            f"reproj med {rs.get('median_px', -1):.1f}px "
            f"(<3px {rs.get('frac_lt3', 0):.2f}) | R={Rr:7.2f} t={tr:6.2f} "
            f"inl={inl}",
            flush=True,
        )

    # ---- held-out evaluation -------------------------------------------------
    obj = next(
        d
        for d in sorted(os.listdir(os.path.join(args.workdir, "data")))
        if os.path.isdir(os.path.join(args.workdir, "data", d))
    )
    anno_path = os.path.join(
        args.workdir, "sfm_outputs", obj, "anno", "anno_3d_average.npz"
    )
    test_seq = sorted(
        d
        for d in os.listdir(os.path.join(args.workdir, "data", obj))
        if os.path.isdir(os.path.join(args.workdir, "data", obj, d))
    )[-1]
    recs = sequence_records(os.path.join(args.workdir, "data", obj, test_seq))
    ids = OnePosePlusInferenceDataset(anno_path, recs, img_size=args.img)
    pc = pad_point_cloud(
        ids.annotation["keypoints3d"],
        ids.annotation["descriptors3d"],
        ids.annotation.get("scores3d"),
        args.shape3d,
        np.random.default_rng(0),
    )
    ccd = None
    if "descriptors3d_coarse" in ids.annotation:
        ccd = pad_point_cloud(
            ids.annotation["keypoints3d"],
            ids.annotation["descriptors3d_coarse"],
            ids.annotation.get("scores3d_coarse"),
            args.shape3d,
            np.random.default_rng(0),
        )["descriptors3d"]

    if use_torch:
        ref_model.eval()
        ref_model.coarse_matching.thr = args.eval_thr

    summary = {"frames": [], "five_cm_five_deg": {}, "train_diag": train_diag}
    hits = {"torch": 0, "jax": 0}
    for fi in range(len(ids)):
        f = ids[fi]
        # jax
        b = {
            "query_image": jnp.asarray(f["image"])[None, ..., None],
            "keypoints3d": jnp.asarray(pc["keypoints3d"])[None],
            "descriptors3d": jnp.asarray(pc["descriptors3d"])[None],
        }
        if ccd is not None:
            b["descriptors3d_coarse"] = jnp.asarray(ccd)[None]
        out = jx_eval_apply(params, batch_stats, b)
        mask = np.asarray(out["match_mask"][0]).astype(bool)
        Rj, tj, inlj = eval_pose_errors(
            np.asarray(out["mkpts_3d"][0]),
            np.asarray(out["mkpts_query_f"][0]),
            mask,
            f["K"],
            f["pose_gt"],
            fi,
        )
        rs_j = match_reproj_stats(
            np.asarray(out["mkpts_3d"][0]),
            np.asarray(out["mkpts_query_f"][0]),
            mask,
            f["K"],
            f["pose_gt"],
        )
        frame_rec = {
            "frame": fi,
            "jax": {"R_deg": Rj, "t_cm": tj, "inliers": inlj,
                    "n": int(mask.sum()), "reproj": rs_j},
        }
        hits["jax"] += (Rj < 5) and (tj < 5)
        t_part = ""
        if use_torch:
            data = {
                "query_image": torch.from_numpy(f["image"][None, None]),
                "query_image_scale": torch.ones(1, 2),
                "keypoints3d": torch.from_numpy(pc["keypoints3d"][None]),
                "descriptors3d_db": torch.from_numpy(
                    pc["descriptors3d"].T[None].copy()
                ),
            }
            if ccd is not None:
                data["descriptors3d_coarse_db"] = torch.from_numpy(
                    ccd.T[None].copy()
                )
            with torch.no_grad():
                ref_model(data)
            mk3d_t = data["mkpts_3d_db"].numpy()
            mk2d_t = data["mkpts_query_f"].numpy()
            cap = 512
            m3 = np.zeros((cap, 3), np.float32)
            m2 = np.zeros((cap, 2), np.float32)
            msk = np.zeros(cap, bool)
            n = min(cap, mk3d_t.shape[0])
            m3[:n], m2[:n], msk[:n] = mk3d_t[:n], mk2d_t[:n], True
            Rt, tt, inlt = eval_pose_errors(m3, m2, msk, f["K"], f["pose_gt"], fi)
            frame_rec["torch"] = {"R_deg": Rt, "t_cm": tt, "inliers": inlt, "n": n}
            hits["torch"] += (Rt < 5) and (tt < 5)
            t_part = f"torch R={Rt:7.2f} t={tt:6.2f} ({n} m) | "
        summary["frames"].append(frame_rec)
        print(
            f"  f{fi:02d} {t_part}"
            f"jax R={Rj:7.2f} t={tj:6.2f} ({int(mask.sum())} m, "
            f"reproj {rs_j.get('median_px', -1):.1f}px)",
            flush=True,
        )

    nf = len(ids)
    summary["five_cm_five_deg"] = {
        k: v / nf for k, v in hits.items() if use_torch or k == "jax"
    }
    summary["final_loss"] = {
        k: float(np.mean([c["loss"] for c in curves[k][-n_last:]]))
        for k in curves
        if curves[k]
    }
    summary["config"] = {
        "epochs": args.epochs,
        "warp_adapt": args.warp_adapt,
        "lr": args.lr,
        "img": args.img,
        "shape3d": args.shape3d,
        "samples": len(usable),
        "held_out_seq": test_seq,
    }
    os.makedirs(args.out, exist_ok=True)
    json.dump(curves, open(os.path.join(args.out, "curves.json"), "w"))
    json.dump(summary, open(os.path.join(args.out, "summary.json"), "w"), indent=1)
    print("\n5cm@5deg held-out:", summary["five_cm_five_deg"])
    print("final epoch loss:", summary["final_loss"])
    print("->", args.out)


if __name__ == "__main__":
    main()
