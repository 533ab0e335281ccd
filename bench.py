"""Headline benchmark: end-to-end query pose throughput (poses/sec/chip).

Runs the COMPLETE per-frame pipeline — OnePosePlusModel 2D-3D matching forward
(bf16 + fused Pallas dual-softmax matching) AND RANSAC-PnP + pose-error
computation — as one fused jitted device step at the reference's inference
configuration (512x512 query crops, 7000-point cloud, d_model 256/128,
``configs/experiment/inference_onepose.yaml``) over frame batches on one chip.

The reference serves queries with 2 Ray workers x 0.5 GPU on a single GPU
(``src/inference/inference_OnePosePlus.py:18-26``, README.md:88), one frame
at a time through torch forward + pycolmap RANSAC; its measured single-GPU
throughput is recorded in BASELINE.md (REFERENCE_FPS below; an estimate until
the reference is profiled end-to-end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import jax

# Persistent compilation cache: the fused batch-48 query step is a ~8 min
# cold XLA compile (the scan body inlines the full model + 3584-candidate
# RANSAC); with the cache a re-run reloads it in seconds. Same dir the CLIs
# use (utils/config_loader.py).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "onepose_jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from onepose_plus_plus_tpu.config import CoarseMatchingConfig, OnePosePlusConfig
from onepose_plus_plus_tpu.inference.pipeline import make_query_step
from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

# Reference operational envelope: per-frame forward + RANSAC PnP on one GPU via
# two fractional-GPU Ray workers. No FPS is published in-tree, so the
# denominator is the DERIVED UPPER BOUND from scripts/derive_reference_fps.py
# (committed artifacts/reference_fps.json): the unmodified reference torch
# forward is 358.7 GFLOP at the 512^2 x 7000 inference shape (measured with
# torch.profiler via the reference_stubs import shims); on the most favorable
# reference-era GPU corner (RTX 3090 at 45% fp32 utilization, full host/GPU
# overlap of the serial pycolmap PnP) that caps at 41 FPS. Realistic
# envelopes are 5.5-28 FPS (2080Ti at 15-45%, 3090 at 15-30%), so
# vs_baseline below is a LOWER bound on the true speedup.
REFERENCE_FPS = 41.0

BATCH = 48  # best poses/sec/chip in the 16-48 sweep
IMG = 512
N_POINTS = 7000


def main():
    rng = np.random.default_rng(0)
    batch = {
        "query_image": jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32)),
        "keypoints3d": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 3)).astype(np.float32)
        ),
        "descriptors3d": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 256)).astype(np.float32)
        ),
        "intrinsics": jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32) * 500.0, (BATCH, 1, 1))
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
        jax.random.PRNGKey(0),
        {k: v for k, v in batch.items() if k != "intrinsics"},
    )

    step = make_query_step(model, variables, num_hypotheses=512)
    pose_gt = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
    key = jax.random.PRNGKey(0)

    # Each dispatch scans SCAN_LEN full, independent steps on device; every
    # step perturbs the input with its own index (defeating any
    # identical-execution result caching in the tunnel) and every step's
    # outputs are materialized and read back. Scanning amortizes the axon
    # tunnel's ~30 ms per-dispatch RTT — an artifact of the remote-device
    # test harness, not of the framework: a production serving loop pipelines
    # dispatches asynchronously against a local runtime where per-dispatch
    # overhead is ~100 us. Poses/sec = total poses / wall time, with all
    # device work on the clock.
    SCAN_LEN = 4

    @jax.jit
    def timed_chunk(b, k0):
        def body(carry, i):
            bb = dict(b)
            bb["query_image"] = b["query_image"] + (k0 + i.astype(jnp.float32)) * 1e-9
            out = step(bb, jax.random.fold_in(key, i), pose_gt)
            return carry, out
        _, outs = jax.lax.scan(body, 0, jnp.arange(SCAN_LEN))
        # scalar checksum: the host reads ONE 4-byte scalar per chunk — any
        # un-jitted indexing on the outputs would itself be a device program
        # with a full tunnel round-trip (~100 ms each)
        chk = outs[1].sum() + outs[2].sum()
        return chk, outs

    # warmup/compile; the float() readback forces execution (block_until_ready
    # does not reliably wait through the remote-device tunnel)
    chk, _ = timed_chunk(batch, jnp.float32(0))
    float(chk)

    # all executions issued first, drained at the end (pipelined dispatch)
    n_iters = 8
    t0 = time.perf_counter()
    outs = [timed_chunk(batch, jnp.float32((k + 1) * SCAN_LEN)) for k in range(n_iters)]
    for chk, _ in outs:
        float(chk)
    dt = time.perf_counter() - t0

    fps = BATCH * SCAN_LEN * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "query_poses_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "poses/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
