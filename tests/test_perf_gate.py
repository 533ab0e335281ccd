"""Throughput regression gate for the flagship inference step (real TPU only).

Round 3 shipped a 7.6x regression in the headline metric (P3P hypotheses ran
~98k 3x3 SVDs per batch-48 step; BENCH_r03.json: 208 -> 27 poses/sec) because
nothing re-measured the fused query step after a hot-path change. This gate
bands the per-step device+dispatch time of the COMPLETE batched query pipeline
(model forward + RANSAC-PnP + pose errors, the exact step bench.py times)
against the value recorded in BASELINE.md, with 1.15x slack (tunnel and
compiler noise sit within ~5% run-to-run; a 15%+ step-time regression is a
real hot-path change and must fail loudly).

Round ritual: re-run ``python bench.py`` (and update BASELINE.md +
REFERENCE_STEP_MS here) after ANY change to the model forward, matching
kernels, or PnP.

Run with: ONEPOSE_TESTS_TPU=1 python -m pytest tests/test_perf_gate.py -m tpu
"""
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU backend"
    ),
]

# Recorded batch-48 fused query step (device + amortized dispatch), ms.
# History: round 2 = ~230 ms (208 poses/sec); round 4 re-measured after the
# P3P triad-alignment fix (BASELINE.md round-4 row). A failure here means a
# hot-path change (forward / matching / PnP) regressed the headline metric —
# fix it or re-record BOTH this constant and BASELINE.md with justification.
REFERENCE_STEP_MS = 233.8  # round-5 measured: bench.py 205.29 poses/sec
# (s2d stem + p3p_samples=128; re-pin alongside BASELINE.md round-5 rows)
SLACK = 1.15

BATCH = 48
IMG = 512
N_POINTS = 7000


def test_query_step_time_band():
    from onepose_plus_plus_tpu.config import (
        CoarseMatchingConfig,
        OnePosePlusConfig,
    )
    from onepose_plus_plus_tpu.inference.pipeline import make_query_step
    from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

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
        "intrinsics": jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32) * 500.0, (BATCH, 1, 1))
        ),
    }
    cfg = OnePosePlusConfig(
        compute_dtype="bfloat16",
        coarse_matching=CoarseMatchingConfig(max_matches=512),
    )
    model = OnePosePlusModel(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0),
        {k: v for k, v in batch.items() if k != "intrinsics"},
    )
    step = make_query_step(model, variables, num_hypotheses=512)
    pose_gt = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
    key = jax.random.PRNGKey(0)

    # warmup / compile (float readback forces execution through the tunnel)
    out = step(batch, key, pose_gt)
    float(out[1].sum())

    # pipelined dispatch, same protocol as bench.py (amortizes tunnel RTT)
    n_iters = 8
    t0 = time.perf_counter()
    outs = [
        step(batch, jax.random.fold_in(key, i), pose_gt)
        for i in range(n_iters)
    ]
    for o in outs:
        float(o[1].sum())
    dt_ms = (time.perf_counter() - t0) / n_iters * 1e3

    limit = REFERENCE_STEP_MS * SLACK
    assert dt_ms <= limit, (
        f"fused query step regressed: {dt_ms:.1f} ms/step at batch {BATCH} "
        f"(recorded {REFERENCE_STEP_MS:.1f} ms, gate {limit:.1f} ms). "
        "A forward/matching/PnP change likely regressed the headline "
        "throughput — run `python bench.py` and root-cause before shipping."
    )
