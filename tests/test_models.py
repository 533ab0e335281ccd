import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_plus_plus_tpu.config import (
    OnePosePlusConfig,
    LoFTRConfig,
    CoarseMatchingConfig,
    FineConfig,
    TransformerConfig,
    KeypointEncodingConfig,
    ResNetFPNConfig,
)
from onepose_plus_plus_tpu.models import OnePosePlusModel, LoFTRMatcher

TINY_BACKBONE = ResNetFPNConfig(initial_dim=8, block_dims=(8, 12, 16))


def tiny_o3d_cfg(train_slots=16):
    return OnePosePlusConfig(
        backbone=TINY_BACKBONE,
        keypoints_encoding=KeypointEncodingConfig(descriptor_dim=16, layers=(4, 8)),
        coarse=TransformerConfig(d_model=16, nhead=4, layer_iter_n=1),
        coarse_matching=CoarseMatchingConfig(
            max_matches=8, train_max_matches=train_slots, train_pad_num_gt_min=4
        ),
        fine=FineConfig(
            window_size=5,
            d_model=8,
            transformer=TransformerConfig(d_model=8, nhead=2, layer_iter_n=1),
        ),
    )


@pytest.fixture(scope="module")
def o3d_setup():
    cfg = tiny_o3d_cfg()
    model = OnePosePlusModel(cfg)
    rng = jax.random.PRNGKey(0)
    n, h, w, L = 2, 64, 64, 24
    batch = {
        "query_image": jax.random.uniform(rng, (n, h, w, 1)),
        "keypoints3d": jax.random.normal(rng, (n, L, 3)) * 0.1,
        "descriptors3d": jax.random.normal(rng, (n, L, 8)) * 0.1,
        "descriptors3d_coarse": jax.random.normal(rng, (n, L, 16)) * 0.1,
    }
    # jitted init: op-by-op dispatch of the un-jitted tracer costs ~40 s
    variables = jax.jit(model.init)({"params": rng, "matching": rng}, batch)
    return cfg, model, variables, batch


def test_onepose_plus_forward_shapes(o3d_setup):
    cfg, model, variables, batch = o3d_setup
    out = model.apply(variables, batch)
    n, L = 2, 24
    K = cfg.coarse_matching.max_matches
    assert out["conf_matrix"].shape == (n, L, 8 * 8)
    assert out["i_ids"].shape == (n, K)
    assert out["mkpts_query_f"].shape == (n, K, 2)
    assert out["mkpts_3d"].shape == (n, K, 3)
    assert out["expec_f"].shape == (n, K, 3)
    assert np.all(np.isfinite(np.asarray(out["mkpts_query_f"])))
    # conf matrix rows/cols are products of softmaxes -> in [0, 1]
    cm = np.asarray(out["conf_matrix"])
    assert cm.min() >= 0 and cm.max() <= 1.0 + 1e-5


def test_onepose_plus_forward_jit_and_vmapable(o3d_setup):
    cfg, model, variables, batch = o3d_setup
    fwd = jax.jit(lambda v, b: model.apply(v, b))
    out = fwd(variables, batch)
    assert out["mkpts_query_f"].shape[0] == 2


@pytest.mark.slow
def test_onepose_plus_train_mode_gt_padding(o3d_setup):
    cfg, model, variables, batch = o3d_setup
    n, L, S = 2, 24, 64
    gt_cell = np.full((n, L), -1, np.int32)
    gt_cell[:, 3] = 30
    gt_cell[:, 5] = 35
    tb = dict(batch, gt_cell=jnp.asarray(gt_cell))
    out, _ = model.apply(
        variables,
        tb,
        train=True,
        rngs={"matching": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    K = cfg.coarse_matching.train_max_matches
    assert out["i_ids"].shape == (n, K)
    # last train_pad_num_gt_min slots are GT rows
    pad = cfg.coarse_matching.train_pad_num_gt_min
    gt_rows = np.asarray(out["i_ids"][:, -pad:])
    assert set(gt_rows.reshape(-1).tolist()) <= {3, 5}


@pytest.mark.slow
def test_loftr_matcher_modes():
    cfg = LoFTRConfig(
        backbone=TINY_BACKBONE,
        coarse=TransformerConfig(d_model=16, nhead=4, layer_iter_n=1),
        coarse_matching=CoarseMatchingConfig(
            thr=0.2, temperature=0.1, max_matches=8, border_two_sided=True
        ),
        fine_window_size=5,
        fine=TransformerConfig(d_model=8, nhead=2, layer_iter_n=1),
    )
    model = LoFTRMatcher(cfg)
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (1, 64, 64, 1))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 1))
    variables = model.init(rng, img0, img1)

    out = model.apply(variables, img0, img1, method="match")
    assert out["mkpts0_f"].shape == (1, 8, 2)
    assert out["mkpts1_f"].shape == (1, 8, 2)

    out_c = model.apply(variables, img0, img1, method="match_coarse")
    assert out_c["mkpts0_c"].shape == (1, 8, 2)

    mk0 = jnp.full((1, 8, 2), 32.0)
    mk1 = jnp.full((1, 8, 2), 24.0)
    mask = jnp.ones((1, 8), bool)
    out_r = model.apply(
        variables, img0, img1, mk0, mk1, mask, True, method="refine"
    )
    assert out_r["mkpts1_f"].shape == (1, 8, 2)
    assert out_r["feat_coarse_0"].shape == (1, 8, 16)
    assert out_r["feat_fine_0"].shape == (1, 8, 8)
    # identical images + identical centers -> refined offset should be small
    assert np.all(np.isfinite(np.asarray(out_r["mkpts1_f"])))


@pytest.mark.slow
def test_matching_self_consistency_identical_images():
    """Matching an image with itself should produce near-diagonal matches."""
    cfg = LoFTRConfig(
        backbone=TINY_BACKBONE,
        coarse=TransformerConfig(d_model=16, nhead=4, layer_iter_n=1),
        coarse_matching=CoarseMatchingConfig(
            thr=0.05, temperature=0.1, max_matches=16, border_two_sided=True
        ),
        fine_window_size=5,
        fine=TransformerConfig(d_model=8, nhead=2, layer_iter_n=1),
    )
    model = LoFTRMatcher(cfg)
    rng = jax.random.PRNGKey(3)
    img = jax.random.uniform(rng, (1, 64, 64, 1))
    variables = model.init(rng, img, img)
    out = model.apply(variables, img, img, method="match_coarse")
    mask = np.asarray(out["match_mask"][0])
    if mask.any():
        i_ids = np.asarray(out["i_ids"][0])[mask]
        j_ids = np.asarray(out["j_ids"][0])[mask]
        # self-matching: the dominant correspondence is the identity
        assert (i_ids == j_ids).mean() > 0.5


class TestComputeDtype:
    @pytest.mark.slow
    def test_bf16_matches_f32_forward(self):
        """bf16 compute path must agree with f32 on match selection."""
        import numpy as np

        from onepose_plus_plus_tpu.config import (
            CoarseMatchingConfig,
            OnePosePlusConfig,
        )
        from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

        rng = np.random.default_rng(0)
        batch = {
            "query_image": jnp.asarray(rng.random((1, 64, 64, 1), np.float32)),
            "keypoints3d": jnp.asarray(
                rng.standard_normal((1, 96, 3)).astype(np.float32)
            ),
            "descriptors3d": jnp.asarray(
                rng.standard_normal((1, 96, 128)).astype(np.float32)
            ),
            "descriptors3d_coarse": jnp.asarray(
                rng.standard_normal((1, 96, 256)).astype(np.float32)
            ),
        }
        outs = {}
        for dt in ("float32", "bfloat16"):
            cfg = OnePosePlusConfig(
                compute_dtype=dt,
                coarse_matching=CoarseMatchingConfig(max_matches=32, thr=1e-6),
            )
            model = OnePosePlusModel(cfg)
            vs = model.init(jax.random.PRNGKey(0), batch, train=False)
            outs[dt] = model.apply(vs, batch, train=False)
        # params identical (f32 param_dtype in both); outputs must be close
        m32 = np.asarray(outs["float32"]["match_mask"][0])
        m16 = np.asarray(outs["bfloat16"]["match_mask"][0])
        i32 = np.asarray(outs["float32"]["i_ids"][0])[m32]
        i16 = np.asarray(outs["bfloat16"]["i_ids"][0])[m16]
        overlap = len(set(i32.tolist()) & set(i16.tolist())) / max(len(i32), 1)
        assert overlap > 0.8, f"bf16 changed matches too much: {overlap}"
        # fine coordinates of shared matches stay within a pixel
        f32map = dict(zip(i32.tolist(), np.asarray(outs["float32"]["mkpts_query_f"][0])[m32]))
        f16map = dict(zip(i16.tolist(), np.asarray(outs["bfloat16"]["mkpts_query_f"][0])[m16]))
        for i in set(f32map) & set(f16map):
            assert np.abs(f32map[i] - f16map[i]).max() < 2.0


class TestBackboneVariants:
    @pytest.mark.slow
    def test_fpn_16_4_shapes(self):
        import numpy as np

        from onepose_plus_plus_tpu.config import ResNetFPNConfig
        from onepose_plus_plus_tpu.models.backbone import ResNetFPN_16_4

        bb = ResNetFPN_16_4(
            ResNetFPNConfig(initial_dim=32, block_dims=(32, 48, 64, 96))
        )
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 1), np.float32))
        vs = bb.init(jax.random.PRNGKey(0), x, train=False)
        c, f = bb.apply(vs, x, train=False)
        assert c.shape == (1, 4, 4, 96)   # 1/16
        assert f.shape == (1, 16, 16, 48)  # 1/4

    def test_resnet18_c_stages(self):
        import numpy as np

        from onepose_plus_plus_tpu.config import ResNetFPNConfig
        from onepose_plus_plus_tpu.models.backbone import ResNet18_C, build_backbone

        x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 1), np.float32))
        for stage, hw, ch in ((2, 16, 32), (3, 8, 48)):
            bb = ResNet18_C(
                ResNetFPNConfig(initial_dim=32, block_dims=(32, 48, 64)), stage=stage
            )
            vs = bb.init(jax.random.PRNGKey(0), x, train=False)
            out = bb.apply(vs, x, train=False)
            assert out.shape == (1, hw, hw, ch)
        assert build_backbone("ResNetFPN_8_2", ResNetFPNConfig()) is not None
