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
SCAN = 4  # device iterations per dispatch: amortizes the ~32 ms tunnel RTT
          # (and removes the ambiguity of whether RTT overlaps device compute)


def bench(fn, *args):
    """Per-iteration device time of ``fn(*args, k_scalar)``.

    Each dispatch runs SCAN independent iterations under ``lax.scan`` (every
    iteration gets a distinct k, defeating tunnel result caching) and reads
    back one scalar checksum; ITERS dispatches are issued pipelined then
    drained.
    """

    @jax.jit
    def chunk(k0, *a):
        def body(carry, i):
            out = fn(*a, k0 + i.astype(jnp.float32))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf.astype(jnp.float32)), 0
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))
        return tot

    float(chunk(jnp.float32(0), *args))
    t0 = time.perf_counter()
    outs = [chunk(jnp.float32((k + 1) * SCAN), *args) for k in range(ITERS)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / (ITERS * SCAN)


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

    if NAME in (
        "forward", "step", "fwd_nofine", "fwd_noctx", "fwd_finelite",
        "fwd_sparse",
    ):
        import dataclasses as dc

        if NAME == "fwd_nofine":
            cfg = dc.replace(cfg, fine=dc.replace(cfg.fine, enable=False))
            model = OnePosePlusModel(cfg)
        elif NAME == "fwd_sparse":
            cfg = dc.replace(cfg, fine=dc.replace(cfg.fine, sparse_fpn=True))
            model = OnePosePlusModel(cfg)
        elif NAME == "fwd_finelite":
            # fine FPN branch + gather + heatmap, but no fine transformer
            cfg = dc.replace(
                cfg,
                fine=dc.replace(
                    cfg.fine,
                    transformer=dc.replace(cfg.fine.transformer, layer_iter_n=0),
                ),
            )
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

    if NAME in ("train", "train_xla"):
        # full train step (forward+backward+AdamW) at the reference train
        # config: 512^2 images, 7000-pt cloud, 1428 train match slots, bf16.
        # "train" uses the fused Pallas coarse-loss/selection kernels (TPU
        # default), "train_xla" forces the materialized-conf XLA fallback.
        import dataclasses as dc

        from flax.core import FrozenDict

        from onepose_plus_plus_tpu.train.train_step import (
            TrainConfig,
            TrainState,
            make_lr_schedule,
            make_optimizer,
            train_step,
        )
        from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel as _M

        tb = BATCH if len(sys.argv) > 2 else 4
        cfg = OnePosePlusConfig(
            compute_dtype="bfloat16",
            coarse_matching=CoarseMatchingConfig(
                use_fused_kernel=None if NAME == "train" else False
            ),
        )
        s_grid = (IMG // 8) ** 2
        batch = {
            "query_image": jnp.asarray(rng.random((tb, IMG, IMG, 1), np.float32)),
            "keypoints3d": jnp.asarray(
                rng.standard_normal((tb, N_POINTS, 3)).astype(np.float32)
            ),
            "descriptors3d": jnp.asarray(
                rng.standard_normal((tb, N_POINTS, 128)).astype(np.float32)
            ),
            "descriptors3d_coarse": jnp.asarray(
                rng.standard_normal((tb, N_POINTS, 256)).astype(np.float32)
            ),
            "gt_cell": jnp.asarray(
                np.where(
                    rng.random((tb, N_POINTS)) < 0.2,
                    rng.integers(0, s_grid, (tb, N_POINTS)),
                    -1,
                ).astype(np.int32)
            ),
            "gt_fine_xy": jnp.asarray(
                (rng.random((tb, N_POINTS, 2)) * IMG).astype(np.float32)
            ),
        }
        tcfg = TrainConfig()
        model = _M(cfg)
        # jitted init — un-jitted flax init over the axon tunnel takes minutes
        variables = jax.jit(
            lambda r, b: model.init(
                {"params": r, "matching": jax.random.PRNGKey(9)}, b, train=True
            )
        )(jax.random.PRNGKey(0), batch)
        tx = make_optimizer(
            tcfg, make_lr_schedule(tcfg, tcfg.true_lr(tb), 1000)
        )
        params = variables["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
            tx=tx,
        )
        key = jax.random.PRNGKey(1)

        @jax.jit
        def chunk(state, k0):
            def body(st, i):
                b = dict(batch)
                b["query_image"] = b["query_image"] + (k0 + i.astype(jnp.float32)) * 1e-9
                st, scalars = train_step(model, st, b, key, tcfg)
                return st, scalars["loss"]

            state, losses = jax.lax.scan(body, state, jnp.arange(SCAN))
            return state, jnp.sum(losses)

        state, tot = chunk(state, jnp.float32(0))
        float(tot)
        t0 = time.perf_counter()
        for k in range(ITERS):
            state, tot = chunk(state, jnp.float32((k + 1) * SCAN))
        float(tot)
        t = (time.perf_counter() - t0) / (ITERS * SCAN)
        print(f"{NAME}: {t*1e3:.1f} ms/step ({tb/t:.2f} samples/s, batch {tb})")
        return

    if NAME in ("backbone", "backbone_q", "bbfull"):
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.backbone import ResNetFPN_8_2

        bcfg = cfg.backbone
        if NAME == "backbone_q":
            bcfg = dc.replace(bcfg, quant_int8=True)
        bb = ResNetFPN_8_2(bcfg, dtype=jnp.bfloat16)
        img = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
        v = jax.jit(lambda r, x: bb.init(r, x, train=False))(jax.random.PRNGKey(0), img)

        if NAME == "bbfull":
            # sum BOTH outputs so XLA cannot dead-code-eliminate the FPN
            # fine branch (the coarse-only profiles do exactly that)
            @jax.jit
            def f(x, k):
                c_map, f_map = bb.apply(v, x + k * 1e-9, train=False)
                return jnp.sum(c_map.astype(jnp.float32)) + jnp.sum(
                    f_map.astype(jnp.float32)
                )
        else:

            @jax.jit
            def f(x, k):
                return bb.apply(v, x + k * 1e-9, train=False)[0]

        print(f"{NAME}: {bench(f, img)*1e3:.1f} ms")
        return

    if NAME.startswith("finestage"):
        # the model's exact fine block at production shapes:
        #   finestage       — gather + desc take_rows + transformer + heatmap
        #   finestage_notr  — transformer skipped (glue only)
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.transformer import LocalFeatureTransformer
        from onepose_plus_plus_tpu.ops.window_gather import gather_windows_aligned
        from onepose_plus_plus_tpu.ops.take import take_rows
        from onepose_plus_plus_tpu.ops.soft_argmax import (
            heatmap_std,
            spatial_expectation_2d,
        )

        ft = LocalFeatureTransformer(
            dc.replace(cfg.fine.transformer, compute_dtype="bfloat16")
        )
        K, W = 512, 5
        feat_f = jnp.asarray(
            rng.standard_normal((BATCH, 256, 256, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        j_ids = jnp.asarray(rng.integers(0, 64 * 64, (BATCH, K)).astype(np.int32))
        i_ids = jnp.asarray(rng.integers(0, N_POINTS, (BATCH, K)).astype(np.int32))
        desc3d = jnp.asarray(
            rng.standard_normal((BATCH, N_POINTS, 128)).astype(np.float32)
        )
        d0i = jnp.zeros((BATCH * K, 1, 128), jnp.bfloat16)
        d1i = jnp.zeros((BATCH * K, W * W, 128), jnp.bfloat16)
        v = jax.jit(lambda r: ft.init(r, d0i, d1i))(jax.random.PRNGKey(0))
        run_tr = NAME == "finestage"

        @jax.jit
        def f(fm, ji, ii, dd, k):
            fm = (fm + (k * 1e-9).astype(fm.dtype)).astype(fm.dtype)
            windows = gather_windows_aligned(fm, ji, (64, 64), 4, W)
            desc_sel = take_rows(dd, ii)
            d0 = desc_sel.astype(windows.dtype).reshape(BATCH * K, 1, 128)
            d1 = windows.reshape(BATCH * K, W * W, 128)
            if run_tr:
                d0, d1 = ft.apply(v, d0, d1)
            center = d0[:, 0, :]
            sim = jnp.einsum("mc,mrc->mr", center, d1) / (128**0.5)
            heat = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            coords = spatial_expectation_2d(heat, W)
            std = heatmap_std(heat, coords, W)
            return coords, std

        print(f"{NAME}: {bench(f, feat_f, j_ids, i_ids, desc3d)*1e3:.1f} ms")
        return

    if NAME in ("pnponly", "pnponly_full"):
        # Isolated RANSAC-PnP stage at the production inference shape
        # ([B, 512] correspondences, 20% outliers): verifies the p3p_samples
        # budget cut (round-4: 36.5 ms/step at batch 48 with all families at
        # full H; target <= 15 ms). "pnponly_full" runs the legacy
        # p3p_samples=0 (all 512 samples through P3P) for the A/B.
        from onepose_plus_plus_tpu.geometry.pnp import ransac_pnp_batch

        N = 512
        K3 = np.tile(np.eye(3, dtype=np.float32) * 500.0, (BATCH, 1, 1))
        K3[:, 0, 2] = K3[:, 1, 2] = 256.0
        pts3d = rng.standard_normal((BATCH, N, 3)).astype(np.float32)
        Rgt = np.eye(3, dtype=np.float32)
        tgt = np.array([0, 0, 4.0], np.float32)
        cam = pts3d @ Rgt.T + tgt
        uv = cam @ np.transpose(K3, (0, 2, 1))
        uv = uv[..., :2] / np.clip(uv[..., 2:3], 1e-6, None)
        out_mask = rng.random((BATCH, N)) < 0.2
        uv = np.where(out_mask[..., None], uv + rng.uniform(30, 90, uv.shape), uv)
        p3 = jnp.asarray(pts3d)
        p2 = jnp.asarray(uv.astype(np.float32))
        Kd = jnp.asarray(K3)
        valid = jnp.asarray(np.ones((BATCH, N), bool))
        p3p_s = 0 if NAME == "pnponly_full" else 128

        @jax.jit
        def f(a, k):
            res = ransac_pnp_batch(
                a + k * 1e-9, p2, Kd, valid,
                jax.random.fold_in(jax.random.PRNGKey(0), k.astype(jnp.int32)),
                num_hypotheses=512, p3p_samples=p3p_s,
            )
            return res.t, res.num_inliers

        t = bench(f, p3)
        print(f"{NAME} (p3p_samples={p3p_s}): {t*1e3:.1f} ms")
        return

    if NAME in ("fineenc_xla", "fineenc_fused"):
        import dataclasses as dc

        from onepose_plus_plus_tpu.models.transformer import LocalFeatureTransformer

        ft = LocalFeatureTransformer(
            dc.replace(
                cfg.fine.transformer,
                compute_dtype="bfloat16",
                fused_encoder=NAME == "fineenc_fused",
            )
        )
        mtot = BATCH * 512
        d0 = jnp.asarray(
            rng.standard_normal((mtot, 1, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        d1 = jnp.asarray(
            rng.standard_normal((mtot, 25, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        v = jax.jit(lambda r: ft.init(r, d0, d1))(jax.random.PRNGKey(0))

        @jax.jit
        def f(a, b, k):
            x0, x1 = ft.apply(v, (a + (k * 1e-9).astype(a.dtype)), b)
            return x1

        print(f"{NAME}: {bench(f, d0, d1)*1e3:.1f} ms")
        return

    if NAME == "fpnops":
        # standalone timings of the FPN fine-branch ops (random weights,
        # production shapes) — locates the inefficiency inside the 59 ms
        # fine branch
        from jax import lax

        from onepose_plus_plus_tpu.ops.upsample import upsample2x_align_corners

        bf = jnp.bfloat16
        x1 = jnp.asarray(rng.standard_normal((BATCH, 256, 256, 128)), bf)
        x2o = jnp.asarray(rng.standard_normal((BATCH, 128, 128, 196)), bf)
        w11 = jnp.asarray(rng.standard_normal((1, 1, 128, 196)) * 0.05, bf)
        w33a = jnp.asarray(rng.standard_normal((3, 3, 196, 196)) * 0.02, bf)
        w33b = jnp.asarray(rng.standard_normal((3, 3, 196, 128)) * 0.02, bf)

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=lax.conv_dimension_numbers(
                    x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )

        @jax.jit
        def up(x, k):
            return upsample2x_align_corners((x + (k * 1e-9).astype(bf)).astype(bf))

        @jax.jit
        def c11(x, k):
            return conv((x + (k * 1e-9).astype(bf)).astype(bf), w11)

        @jax.jit
        def c33a(x, k):
            return conv((x + (k * 1e-9).astype(bf)).astype(bf), w33a)

        @jax.jit
        def c33b(x, k):
            return conv((x + (k * 1e-9).astype(bf)).astype(bf), w33b)

        x1o = jnp.asarray(rng.standard_normal((BATCH, 256, 256, 196)), bf)
        print(f"upsample 128->256 @196ch: {bench(up, x2o)*1e3:.1f} ms")
        print(f"conv1x1 128->196 @256^2: {bench(c11, x1)*1e3:.1f} ms")
        print(f"conv3x3 196->196 @256^2: {bench(c33a, x1o)*1e3:.1f} ms")
        print(f"conv3x3 196->128 @256^2: {bench(c33b, x1o)*1e3:.1f} ms")
        return

    if NAME == "gather":
        from onepose_plus_plus_tpu.ops.window_gather import gather_windows_aligned

        fm = jnp.asarray(
            rng.standard_normal((BATCH, IMG // 2, IMG // 2, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ids = jnp.asarray(rng.integers(0, 64 * 64, (BATCH, 512)).astype(np.int32))

        @jax.jit
        def f(m, i, k):
            return gather_windows_aligned(m + k * 1e-9, i, (64, 64), 4, 5)

        print(f"gather: {bench(f, fm, ids)*1e3:.1f} ms")
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

    if NAME == "bbparts":
        # Per-stage backbone attribution at production shapes (roofline work,
        # round-4 verdict item #4): times each trunk/FPN stage as its own
        # program so the 95-vs-63-ms FLOP-floor gap can be localized. Inputs
        # are stage-shaped random tensors; weights random. FLOP floors at
        # batch 48, 512^2, v5e 197 TFLOP/s bf16 are printed alongside.
        from jax import lax

        bf = jnp.bfloat16
        B = BATCH

        def conv(x, w, stride=1):
            return lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=lax.conv_dimension_numbers(
                    x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )

        def w(kh, cin, cout):
            return jnp.asarray(
                rng.standard_normal((kh, kh, cin, cout)) * 0.05, bf
            )

        def basic_pair(x, cin, cmid, stride):
            # one BasicBlock pair (stride s then 1) without BN (BN fuses into
            # the conv at inference; its cost is what we want included in the
            # dense-conv number anyway via the elementwise epilogue)
            w1, w2 = w(3, cin, cmid), w(3, cmid, cmid)
            w3, w4 = w(3, cmid, cmid), w(3, cmid, cmid)
            wd = w(1, cin, cmid)
            y = jax.nn.relu(conv(x, w1, stride))
            y = conv(y, w2)
            sc = conv(x, wd, stride) if stride != 1 else x
            x = jax.nn.relu(sc + y)
            y = jax.nn.relu(conv(x, w3))
            y = conv(y, w4)
            return jax.nn.relu(x + y)

        img = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32), bf)
        x0 = jnp.asarray(rng.standard_normal((B, 256, 256, 128)), bf)
        x2 = jnp.asarray(rng.standard_normal((B, 128, 128, 196)), bf)
        x3 = jnp.asarray(rng.standard_normal((B, 64, 64, 256)), bf)

        w_stem = w(7, 1, 128)
        stages = {
            "stem 7x7/2 1->128 @512^2": (
                lambda x, k: jax.nn.relu(
                    conv(x + (k * 1e-9).astype(bf), w_stem, 2)
                ),
                img, 0.020,
            ),
            "layer1 4x conv3 128 @256^2": (
                lambda x, k: basic_pair(x + (k * 1e-9).astype(bf), 128, 128, 1),
                x0, 3.71,
            ),
            "layer2 (s2) -> 196 @128^2": (
                lambda x, k: basic_pair(x + (k * 1e-9).astype(bf), 128, 196, 2),
                x0, 1.99,
            ),
            "layer3 (s2) -> 256 @64^2": (
                lambda x, k: basic_pair(x + (k * 1e-9).astype(bf), 196, 256, 2),
                x2, 0.86,
            ),
        }
        # FPN mid level (1/4): lateral 1x1 + upsample-add + 3x3 pair
        from onepose_plus_plus_tpu.ops.upsample import upsample2x_align_corners

        wl2, wa, wb = w(1, 196, 256), w(3, 256, 256), w(3, 256, 196)

        def fpn_mid(x, k):
            lat = conv(x + (k * 1e-9).astype(bf), wl2)
            up = upsample2x_align_corners(
                jnp.asarray(rng.standard_normal((B, 64, 64, 256)), bf)
            )
            y = jax.nn.leaky_relu(conv(lat + up, wa), 0.01)
            return conv(y, wb)

        stages["fpn mid (1/4) lat+up+3x3 pair"] = (fpn_mid, x2, 1.78)

        wl1, wc, wd2 = w(1, 128, 196), w(3, 196, 196), w(3, 196, 128)

        def fpn_fine(x, k):
            lat = conv(x + (k * 1e-9).astype(bf), wl1)
            up = upsample2x_align_corners(
                jnp.asarray(rng.standard_normal((B, 128, 128, 196)), bf)
            )
            y = jax.nn.leaky_relu(conv(lat + up, wc), 0.01)
            return conv(y, wd2)

        stages["fpn fine (1/2) lat+up+3x3 pair"] = (fpn_fine, x0, 3.93)

        total = 0.0
        for label, (fn, inp, tflop) in stages.items():
            t = bench(jax.jit(fn), inp) * 1e3
            total += t
            floor = tflop * (B / 48) / 197.0 * 1e3
            print(
                f"{label}: {t:.1f} ms (FLOP {tflop * (B / 48):.2f} T, "
                f"floor {floor:.1f} ms, {floor / max(t, 1e-9) * 100:.0f}% MXU)"
            )
        print(f"bbparts sum: {total:.1f} ms")
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
