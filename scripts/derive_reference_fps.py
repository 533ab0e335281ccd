"""Derive a bounded reference-FPS baseline (VERDICT r2 Missing #4).

bench.py's ``vs_baseline`` divided by an unmeasured ``REFERENCE_FPS = 20.0``
estimate. No GPU exists in this environment, so the reference envelope
(``/root/reference/src/inference/inference_OnePosePlus.py:18-26``: per-frame
torch forward + pycolmap PnP, 2 Ray workers x 0.5 GPU on one >=6 GB GPU,
``README.md:88``) is bounded instead:

  1. measure the unmodified reference torch model's forward wall time on this
     host CPU at the production inference shape (512^2 image x 7000 points),
     via the import shims in tests/reference_stubs.py;
  2. count the forward FLOPs with torch.profiler (with_flops);
  3. bound the GPU forward time as FLOPs / (peak fp32 * utilization) for the
     reference-era single GPU (RTX 3090: 35.6 TFLOP fp32 with 2:1 FMA;
     2080 Ti: 13.4) at generous utilizations, add the serial per-frame host
     cost (pycolmap RANSAC PnP + python glue, ~5-10 ms measured class), and
     credit the 2-worker overlap.

The output JSON (artifacts/reference_fps.json) records every input of the
derivation; BASELINE.md cites it and bench.py pins the upper bound.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import numpy as np
    import torch

    from reference_stubs import build_reference_onepose_model

    torch.set_num_threads(os.cpu_count() or 1)
    model = build_reference_onepose_model()
    rng = np.random.default_rng(0)
    data = {
        "query_image": torch.from_numpy(
            rng.random((1, 1, 512, 512)).astype(np.float32)
        ),
        "keypoints3d": torch.from_numpy(
            (rng.standard_normal((1, 7000, 3)) * 0.1).astype(np.float32)
        ),
        "descriptors3d_db": torch.from_numpy(
            rng.standard_normal((1, 128, 7000)).astype(np.float32)
        ),
        "descriptors3d_coarse_db": torch.from_numpy(
            rng.standard_normal((1, 256, 7000)).astype(np.float32)
        ),
    }
    # coarse threshold 0 so the fine stage sees a realistic match count
    model.coarse_matching.thr = 0.0

    def fwd():
        d = dict(data)
        with torch.no_grad():
            model(d)
        return d

    fwd()  # warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fwd()
        times.append(time.perf_counter() - t0)
    cpu_ms = float(np.median(times) * 1e3)

    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as prof:
        fwd()
    flops = sum(e.flops for e in prof.key_averages() if e.flops)

    # GPU forward bound: FLOPs / (peak * util). Matmul-dominated CNN+attention
    # at batch 1 rarely exceeds ~40% fp32 utilization; 15% is the pessimistic
    # (reference-slow) end.
    gpus = {
        "RTX_2080Ti": 13.4e12,
        "RTX_3090": 35.6e12,
    }
    rows = {}
    for name, peak in gpus.items():
        for util in (0.15, 0.30, 0.45):
            fwd_ms = flops / (peak * util) * 1e3
            # serial per-frame host work (pycolmap RANSAC + data/glue):
            # pycolmap absolute_pose_estimation at ~1-2k correspondences is
            # 3-10 ms; python loop glue ~2 ms. 2 Ray workers overlap host
            # with GPU, so per-frame time ~= max(fwd, host) + small sync.
            host_ms = 7.0
            frame_ms = max(fwd_ms, host_ms) + 2.0
            rows[f"{name}_util{int(util*100)}"] = {
                "fwd_ms": round(fwd_ms, 2),
                "fps": round(1e3 / frame_ms, 1),
            }

    # The most favorable-to-reference corner (3090 at 45% util) caps at the
    # host floor; take it as the baseline denominator.
    best_fps = max(r["fps"] for r in rows.values())
    out = {
        "method": "torch-CPU timing + profiler FLOP count + GPU roofline bound",
        "shape": "512x512 image, 7000-point cloud, batch 1 (inference config)",
        "cpu_forward_ms": round(cpu_ms, 1),
        "cpu_threads": torch.get_num_threads(),
        "forward_flops": int(flops),
        "gpu_bounds": rows,
        "host_serial_ms_assumed": 7.0,
        "reference_fps_upper_bound": best_fps,
        "notes": (
            "Reference runs one frame per forward (no batching) with 2 Ray "
            "workers sharing one GPU (inference_OnePosePlus.py:18-26). The "
            "upper bound credits full host/GPU overlap and the fastest "
            "plausible GPU+utilization; the true reference FPS is likely "
            "lower (pycolmap PnP and the python frame loop are serial per "
            "worker)."
        ),
    }
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    path = os.path.join(REPO, "artifacts", "reference_fps.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
