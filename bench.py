"""Headline benchmark: batched 2D-3D query matching throughput (poses/sec/chip).

Runs the flagship OnePosePlusModel forward at the reference's inference
configuration (512x512 query crops, 7000-point cloud, d_model 256/128 —
``configs/experiment/inference_onepose.yaml``) over a frame batch on one chip
and reports query frames matched per second. The reference serves queries with
2 Ray workers x 0.5 GPU on a single GPU (``src/inference/inference_OnePosePlus.py:18-26``,
README.md:88); its measured single-GPU throughput is recorded in BASELINE.md
(REFERENCE_FPS below; an estimate until the reference is profiled end-to-end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from onepose_plus_plus_tpu.config import CoarseMatchingConfig, OnePosePlusConfig
from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

# Reference operational envelope: per-frame forward + RANSAC PnP on one GPU via
# two fractional-GPU Ray workers. No FPS is published in-tree (BASELINE.md);
# 20 FPS is the working estimate for a modern GPU on this pipeline until the
# reference is benchmarked, recorded here so vs_baseline is well-defined.
REFERENCE_FPS = 20.0

BATCH = 16
IMG = 512
N_POINTS = 7000
DTYPE = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    batch = {
        "query_image": jnp.asarray(
            rng.random((BATCH, IMG, IMG, 1), np.float32)
        ),
        "keypoints3d": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 3)).astype(np.float32)
        ),
        "descriptors3d": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 256)).astype(np.float32)
        ),
    }

    cfg = OnePosePlusConfig(
        compute_dtype="bfloat16",
        coarse_matching=CoarseMatchingConfig(max_matches=512),
    )
    model = OnePosePlusModel(cfg)
    # jit the init: un-jitted flax init dispatches each op separately, which
    # is pathological over a remote-device tunnel
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )

    # The iteration index perturbs the input ON DEVICE (defeats any
    # identical-execution result caching in the device tunnel) and the scalar
    # return forces a host readback per iteration (block_until_ready through
    # the tunnel does not reliably wait for remote compute).
    @jax.jit
    def forward(variables, batch, i):
        b = dict(batch)
        b["query_image"] = b["query_image"] + i * 1e-9
        out = model.apply(variables, b, train=False)
        return (
            jnp.sum(out["mkpts_query_f"])
            + jnp.sum(out["mconf"])
            + jnp.sum(out["match_mask"])
        )

    # warmup + compile
    float(forward(variables, batch, jnp.float32(0)))

    n_iters = 10
    t0 = time.perf_counter()
    outs = [forward(variables, batch, jnp.float32(k + 1)) for k in range(n_iters)]
    _ = [float(o) for o in outs]  # drain: every execution must have finished
    dt = time.perf_counter() - t0

    fps = BATCH * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "query_match_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
