"""Record a full end-to-end pipeline run and commit its artifacts.

Builds a dense synthetic OnePose-format object (plane-homography rendered, so
correspondences from ANY photometric matcher satisfy the true epipolar
geometry), then drives the real CLIs exactly as a user would:

    run.py (keypoint-free SfM -> anno npz + COLMAP model + stats.json)
    inference.py (eval -> metrics.txt)
    demo.py (tracking video)
    merge.py (COCO-style training annotations)

and snapshots the stats/metrics artifacts into artifacts/e2e/ for the
regression bands in tests/test_cli_end_to_end.py (VERDICT round-1 item #5:
"run one real end-to-end sequence and record it").

Usage: python scripts/record_e2e.py [--frames 12] [--img 256]

With --tpu the chain runs on the real chip in production config (bf16,
shape3d=7000, 24 frames / 512^2 by default) and snapshots into
artifacts/e2e_tpu/ instead — the on-hardware evidence that the fused
Mosaic kernels drive the full pipeline correctly (they once returned an
empty model while passing every interpret-mode test; see BASELINE.md).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


def run_cli(script, args, tpu=False, timeout=3600, dial_timeout=300,
            stall_timeout=3900):
    env = dict(os.environ)
    if not tpu:
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
    # unbuffered child stdout: with block-buffered pipes a stage that prints
    # its startup line and then sits in a 20+ min server-side compile looks
    # identical to a hung interpreter (observed: a trainer presumed dead at
    # 28 min silent had actually trained 9 epochs — all output sat in the
    # 8 KB buffer)
    env["PYTHONUNBUFFERED"] = "1"
    print(f"== {script} {' '.join(args)}", flush=True)
    # stream stage output to a log file so long stages are observable live;
    # keyed by the driver pid so concurrent chains (e.g. a TPU run and a CPU
    # cross-check) don't clobber each other's stage logs
    log_path = os.path.join(
        env.get("E2E_LOG_DIR", "/tmp"),
        f"e2e_{os.path.basename(script)}.{os.getpid()}.log",
    )
    # TPU children can also hit the relay-dial deadlock at interpreter start
    # (same failure run_cli already shields CPU children from by popping
    # PALLAS_AXON_POOL_IPS). Watchdog: every CLI prints a startup line
    # before its first device compile (run.py "mapping", inference.py
    # "evaluating", demo.py "demo:", trainer "devices="); if the child
    # writes no non-absl output within dial_timeout, kill and retry. A
    # stage past its startup line is never killed — long server-side
    # compiles (20+ min cold for the fused train step) are legitimate.
    # every CLI prints a flushed sentinel line once past backend init (run.py
    # "mapping", inference.py "evaluating", demo.py "demo:", the trainer
    # "devices=", merge.py "merging") — match THOSE, not "any non-absl line":
    # pre-jax-init output (run.py's "shard k/n", absl W0000/E0000) would
    # otherwise mask a genuine relay-dial deadlock from the watchdog
    sentinels = ("mapping", "evaluating", "demo:", "devices=", "merging")
    # one deadline for the whole stage: timeout bounds total wall time
    # including watchdog retries, not per-attempt
    deadline = time.time() + timeout
    for attempt in range(4):
        with open(log_path, "w") as lf:
            p = subprocess.Popen(
                [sys.executable, script] + args, cwd=REPO, env=env, text=True,
                stdout=lf, stderr=subprocess.STDOUT,
            )
            attempt_start = time.time()
            stuck = False
            while True:
                try:
                    p.wait(timeout=15)
                    break
                except subprocess.TimeoutExpired:
                    pass
                if time.time() > deadline:
                    p.kill()
                    p.wait()
                    raise SystemExit(f"{script} timed out ({timeout}s)")
                started = time.time() - attempt_start
                # post-sentinel stall watchdog: a TPU child that has written
                # NOTHING for stall_timeout (beyond any legitimate 20-30 min
                # server-side compile) is stuck on a dead tunnel — kill and
                # retry; stages are idempotent/resume-safe so a retry
                # continues from the last artifact/checkpoint
                if tpu and not stuck:
                    try:
                        quiet = time.time() - os.path.getmtime(log_path)
                    except OSError:
                        quiet = 0.0
                    if quiet > stall_timeout:
                        stuck = True
                        print(
                            f"WATCHDOG: {script} wrote nothing for "
                            f"{int(quiet)}s (tunnel stall) — retrying "
                            f"({attempt + 1}/4)",
                            flush=True,
                        )
                        p.kill()
                        p.wait()
                        time.sleep(5)
                        break
                if tpu and started > dial_timeout and not stuck:
                    out = open(log_path).read()
                    progressed = any(
                        line.startswith(sentinels)
                        for line in out.splitlines()
                    )
                    if not progressed:
                        stuck = True
                        print(
                            f"WATCHDOG: {script} silent {int(started)}s "
                            f"(relay-dial deadlock) — retrying "
                            f"({attempt + 1}/4)",
                            flush=True,
                        )
                        p.kill()
                        p.wait()
                        time.sleep(5)
        if stuck:
            continue
        r = p
        break
    else:
        raise SystemExit(f"{script} stuck at relay dial after 4 attempts")
    r.stdout = open(log_path).read()
    r.stderr = ""
    if r.returncode != 0:
        print(r.stdout[-4000:])
        raise SystemExit(f"{script} failed rc={r.returncode} (log: {log_path})")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip in production config (bf16)")
    args = ap.parse_args()
    if args.frames is None:
        args.frames = 24 if args.tpu else 12
    if args.img is None:
        args.img = 512 if args.tpu else 256
    if args.workdir is None:
        args.workdir = "/tmp/e2e_record_tpu" if args.tpu else "/tmp/e2e_record"

    import cv2
    from synthetic_scenes import make_scene

    obj, seq = "0001-toy-box", "toy-1"
    data_dir = os.path.join(args.workdir, "data")
    sfm_dir = os.path.join(args.workdir, "sfm_outputs")
    out_dir = os.path.join(args.workdir, "results")
    shutil.rmtree(args.workdir, ignore_errors=True)

    rng = np.random.default_rng(0)
    K, pts, Ts = make_scene(
        rng, n_views=args.frames, n_pts=64, img=float(args.img)
    )
    seq_dir = os.path.join(data_dir, obj, seq)
    for sub in ("color", "intrin_ba", "poses_ba"):
        os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
    # dense block texture: 1/8-scale coarse cells must be feature-rich;
    # block size scales with the render resolution (2*img texture overall)
    blk = max(args.img // 32, 4)
    tex = (np.kron(rng.random((64, 64)), np.ones((blk, blk))) * 255).astype(
        np.uint8
    )
    S = np.array(
        [
            [2 * args.img / 0.8, 0, args.img],
            [0, 2 * args.img / 0.8, args.img],
            [0, 0, 1.0],
        ]
    )
    for i in range(args.frames):
        R, t = Ts[i][:3, :3], Ts[i][:3, 3]
        M = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        H = M @ np.linalg.inv(S)
        im = cv2.warpPerspective(tex, H, (args.img, args.img))
        cv2.imwrite(os.path.join(seq_dir, "color", f"{i}.png"), im)
        np.savetxt(os.path.join(seq_dir, "intrin_ba", f"{i}.txt"), K)
        np.savetxt(os.path.join(seq_dir, "poses_ba", f"{i}.txt"), Ts[i])
    corners = np.array(
        [[x, y, z] for z in (-0.3, 0.3) for y in (-0.3, 0.3) for x in (-0.3, 0.3)]
    )
    np.savetxt(os.path.join(data_dir, obj, "box3d_corners.txt"), corners)

    # CPU mode shrinks shapes so the chain fits a test budget; TPU mode runs
    # the production config (bf16 compute, shape3d=7000 point capacity)
    dtype_ov = [] if args.tpu else ["model.compute_dtype=float32"]
    run_cli(
        "run.py",
        [
            "+preprocess=sfm_inference_onepose",
            "ids=null",
            f"dataset.data_dir={data_dir}",
            f"dataset.outputs_dir={sfm_dir}",
            "dataset.down_ratio=1",
            f"sfm.pair_batch={8 if args.tpu else 4}",
            f"sfm.covis_num={10 if args.tpu else 8}",
            "sfm.max_epipolar_error_px=8.0",
            "model.match_coarse.thr=0.000001",
        ]
        + dtype_ov,
        tpu=args.tpu,
    )
    run_cli(
        "inference.py",
        [
            "+experiment=inference_onepose",
            "ids=null",
            f"dataset.data_dir={data_dir}",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.img_resize={args.img}",
            f"inference.frame_batch={8 if args.tpu else 4}",
            "model.match_coarse.thr=0.000001",
            f"output_dir={out_dir}",
        ]
        + ([] if args.tpu else ["dataset.shape3d=512", "inference.num_hypotheses=128"])
        + dtype_ov,
        tpu=args.tpu,
    )
    video_out = os.path.join(args.workdir, "demo.mp4")
    run_cli(
        "demo.py",
        [
            "+experiment=inference_demo",
            f"dataset.data_dir={data_dir}",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.img_resize={args.img}",
            f"demo.num_ref_views={8 if args.tpu else 4}",
            "model.match_coarse.thr=0.000001",
            f"demo.output_video={video_out}",
        ]
        + ([] if args.tpu else ["dataset.shape3d=512"])
        + dtype_ov,
        tpu=args.tpu,
    )
    run_cli(
        "merge.py",
        [
            "+preprocess=merge_anno",
            f"dataset.sfm_outputs_dir={sfm_dir}",
            f"dataset.out_train_file={os.path.join(args.workdir, 'train_anno.json')}",
            "dataset.out_val_file=null",
        ],
        tpu=args.tpu,
    )

    art = os.path.join(REPO, "artifacts", "e2e_tpu" if args.tpu else "e2e")
    os.makedirs(art, exist_ok=True)
    stats = json.load(open(os.path.join(sfm_dir, obj, "stats.json")))
    shutil.copy(os.path.join(sfm_dir, obj, "stats.json"), os.path.join(art, "stats.json"))
    shutil.copy(os.path.join(out_dir, "metrics.txt"), os.path.join(art, "metrics.txt"))
    po = os.path.join(sfm_dir, obj, "post_optimize.json")
    if os.path.exists(po):
        shutil.copy(po, os.path.join(art, "post_optimize.json"))
    meta = {
        "hardware": "TPU v5e (1 chip, axon tunnel), bf16 compute"
        if args.tpu
        else "CPU (8 virtual devices), f32",
        "scene": {"frames": args.frames, "img": args.img, "texture_blocks": 64,
                  "weights": "random-init (no released checkpoint in this environment)"},
        "commands": ["run.py", "inference.py", "demo.py", "merge.py"],
        "demo_video_bytes": os.path.getsize(video_out),
    }
    json.dump(meta, open(os.path.join(art, "meta.json"), "w"), indent=1)
    print(json.dumps(stats, indent=1))
    print("artifacts ->", art)


if __name__ == "__main__":
    main()
