"""Component-level TPU profile of the inference step (not part of the library).

Each component is timed in its OWN process (interleaved programs in one
process contaminate tunnel timing): ``python profile_components.py <name>
[batch]`` with name in {nop, forward, step, backbone, coarse, matching, fine,
pnp, kpt}. One dispatch per iteration, on-device perturbation, float readback
drain.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from onepose_plus_plus_tpu.config import CoarseMatchingConfig, OnePosePlusConfig
from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

NAME = sys.argv[1] if len(sys.argv) > 1 else "forward"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 48
IMG, N_POINTS = 512, 7000
ITERS = 10


def bench(fn, *args):
    out = fn(*args, jnp.float32(0))
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args, jnp.float32(k + 1)) for k in range(ITERS)]
    for o in outs:
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    cfg = OnePosePlusConfig(
        compute_dtype="bfloat16", coarse_matching=CoarseMatchingConfig(max_matches=512)
    )
    model = OnePosePlusModel(cfg)

    if NAME == "nop":
        img = jnp.asarray(rng.random((8, 8), np.float32))

        @jax.jit
        def nop(x, k):
            return x[0, 0] + k

        print(f"nop: {bench(nop, img)*1e3:.1f} ms")
        return

    if NAME in ("forward", "step", "fwd_nofine", "fwd_noctx"):
        import dataclasses as dc

        if NAME == "fwd_nofine":
            cfg = dc.replace(cfg, fine=dc.replace(cfg.fine, enable=False))
            model = OnePosePlusModel(cfg)
        elif NAME == "fwd_noctx":
            cfg = dc.replace(
                cfg,
                fine=dc.replace(cfg.fine, enable=False),
                coarse=dc.replace(cfg.coarse, layer_iter_n=0),
            )
            model = OnePosePlusModel(cfg)
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
        }
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), batch
        )
        if NAME != "step":

            @jax.jit
            def fwd(b, k):
                b = dict(b)
                b["query_image"] = b["query_image"] + k * 1e-9
                return model.apply(variables, b, train=False)["mkpts_query_f"]

            t = bench(fwd, batch)
            print(f"forward: {t*1e3:.1f} ms ({BATCH/t:.1f} fps)")
        else:
            from onepose_plus_plus_tpu.inference.pipeline import make_query_step

            step = make_query_step(model, variables, num_hypotheses=512)
            batch["intrinsics"] = jnp.asarray(
                np.tile(np.eye(3, dtype=np.float32) * 500.0, (BATCH, 1, 1))
            )
            pose_gt = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1)))
            key = jax.random.PRNGKey(0)

            @jax.jit
            def full_step(b, k):
                b = dict(b)
                b["query_image"] = b["query_image"] + k * 1e-9
                return step(b, jax.random.fold_in(key, k.astype(jnp.int32)), pose_gt)

            t = bench(full_step, batch)
            print(f"step: {t*1e3:.1f} ms ({BATCH/t:.1f} poses/s)")
        return

    if NAME in ("backbone", "backbone_q"):
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2

        bcfg = cfg.backbone
        if NAME == "backbone_q":
            bcfg = dc.replace(bcfg, quant_int8=True)
        bb = ResNetFPN_8_2(bcfg, dtype=jnp.bfloat16)
        img = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
        v = jax.jit(lambda r, x: bb.init(r, x, train=False))(jax.random.PRNGKey(0), img)

        @jax.jit
        def f(x, k):
            return bb.apply(v, x + k * 1e-9, train=False)[0]

        print(f"{NAME}: {bench(f, img)*1e3:.1f} ms")
        return

    if NAME == "coarse":
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.transformer import LocalFeatureTransformer

        ct = LocalFeatureTransformer(dc.replace(cfg.coarse, compute_dtype="bfloat16"))
        f0 = jnp.asarray(rng.standard_normal((BATCH, N_POINTS, 256)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((BATCH, 4096, 256)).astype(np.float32))
        v = jax.jit(lambda r: ct.init(r, f0, f1))(jax.random.PRNGKey(0))

        @jax.jit
        def f(a, b, k):
            return ct.apply(v, a + k * 1e-9, b)[0]

        print(f"coarse transformer: {bench(f, f0, f1)*1e3:.1f} ms")
        return

    if NAME == "matching":
        from onepose_plus_plus_tpu.ops.pallas_matching import fused_select_topk_matches

        f0 = jnp.asarray(rng.standard_normal((BATCH, N_POINTS, 256)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((BATCH, 4096, 256)).astype(np.float32))

        @jax.jit
        def f(a, b, k):
            return fused_select_topk_matches(
                a + k * 1e-9, b, 0.08, (64, 64), 0.1, 2, 512
            ).mconf

        print(f"fused matching: {bench(f, f0, f1)*1e3:.1f} ms")
        return

    if NAME == "fine":
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.transformer import LocalFeatureTransformer
        from onepose_plus_plus_tpu.ops.window_gather import gather_windows

        ft = LocalFeatureTransformer(
            dc.replace(cfg.fine.transformer, compute_dtype="bfloat16")
        )
        K = 512
        feat_f = jnp.asarray(
            rng.standard_normal((BATCH, IMG // 2, IMG // 2, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)  # model hands over bf16 fine maps
        centers = jnp.asarray(
            rng.integers(8, IMG // 2 - 8, (BATCH, K, 2)).astype(np.int32)
        )
        desc = jnp.asarray(rng.standard_normal((BATCH, K, 128)).astype(np.float32))
        d0s = jnp.asarray(rng.standard_normal((BATCH * K, 1, 128)).astype(np.float32))
        d1s = jnp.asarray(rng.standard_normal((BATCH * K, 25, 128)).astype(np.float32))
        v = jax.jit(lambda r: ft.init(r, d0s, d1s))(jax.random.PRNGKey(0))

        @jax.jit
        def f(fm, c, d, k):
            w = gather_windows(fm + k * 1e-9, c, 5)  # [B, K, 25, C]
            d0 = d.reshape(BATCH * K, 1, 128)
            d1 = w.reshape(BATCH * K, 25, 128)
            a, b = ft.apply(v, d0, d1)
            sim = jnp.einsum("mc,mrc->mr", a[:, 0], b) / (128**0.5)
            heat = jax.nn.softmax(sim, axis=-1)
            return heat

        print(f"fine stage: {bench(f, feat_f, centers, desc)*1e3:.1f} ms")
        return

    if NAME == "pnp":
        from onepose_plus_plus_tpu.geometry.pnp import ransac_pnp

        K = 512
        p3 = jnp.asarray(rng.standard_normal((BATCH, K, 3)).astype(np.float32))
        p2 = jnp.asarray(rng.random((BATCH, K, 2)).astype(np.float32) * 512)
        Km = jnp.asarray(np.tile(np.eye(3, dtype=np.float32) * 500.0, (BATCH, 1, 1)))
        mask = jnp.ones((BATCH, K), bool)
        keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

        @jax.jit
        def f(a, k):
            res = jax.vmap(
                lambda x, y, Ki, m, kk: ransac_pnp(
                    x, y, Ki, m, kk, reproj_threshold_px=3.3, num_hypotheses=512
                )
            )(a + k * 1e-9, p2, Km, mask, keys)
            return res.R

        print(f"pnp: {bench(f, p3)*1e3:.1f} ms")
        return

    if NAME == "kpt":
        from onepose_plus_plus_tpu.models.position_encoding import (
            KeypointEncoder,
            normalize_3d_keypoints,
        )

        enc = KeypointEncoder()
        kpts = jnp.asarray(rng.standard_normal((BATCH, N_POINTS, 3)).astype(np.float32))
        desc = jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 256)).astype(np.float32)
        )
        v = jax.jit(lambda r: enc.init(r, kpts, desc))(jax.random.PRNGKey(0))

        # NB: desc must be an argument, not a closure constant — the axon
        # remote-compile tunnel ships closure constants in the compile
        # request body (a 344 MB capture fails with HTTP 413).
        @jax.jit
        def f(a, d, k):
            return enc.apply(v, normalize_3d_keypoints(a + k * 1e-9), d)

        print(f"kpt encoder: {bench(f, kpts, desc)*1e3:.1f} ms")
        return

    raise SystemExit(f"unknown component {NAME}")


if __name__ == "__main__":
    main()
