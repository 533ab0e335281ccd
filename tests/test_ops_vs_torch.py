"""Cross-checks of TPU ops against torch reference semantics (torch is CPU-only here)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from onepose_plus_plus_tpu.ops.upsample import upsample2x_align_corners
from onepose_plus_plus_tpu.ops.window_gather import gather_windows
from onepose_plus_plus_tpu.ops.soft_argmax import spatial_expectation_2d, heatmap_std


def test_upsample_matches_torch_align_corners():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 6, 3).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(tx, scale_factor=2.0, mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gather_windows_matches_unfold():
    """gather_windows at coarse-cell centers == F.unfold(kernel=W, stride=s, pad=W//2)."""
    rng = np.random.RandomState(1)
    W, stride = 5, 4
    h_f, w_f, C = 16, 12, 7
    feat = rng.randn(1, h_f, w_f, C).astype(np.float32)
    h_c, w_c = h_f // stride, w_f // stride

    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    unfolded = F.unfold(tfeat, kernel_size=(W, W), stride=stride, padding=W // 2)
    # [1, C*W*W, h_c*w_c] -> [h_c*w_c, W*W, C]
    unfolded = unfolded.reshape(1, C, W * W, -1).permute(0, 3, 2, 1).numpy()[0]

    cells = np.arange(h_c * w_c)
    centers = np.stack([cells // w_c * stride, cells % w_c * stride], -1)[None]
    ours = np.asarray(
        gather_windows(jnp.asarray(feat), jnp.asarray(centers.astype(np.int32)), W)
    )[0]
    np.testing.assert_allclose(ours, unfolded, atol=1e-6)


@pytest.mark.slow
def test_gather_windows_aligned_matches_generic():
    """The MXU block-gather (cell-aligned centers) must equal the generic XLA
    gather exactly, for every window/stride combination both matchers use,
    f32 and bf16, including out-of-range (padded-slot) cell ids -> zeros."""
    from onepose_plus_plus_tpu.ops.window_gather import gather_windows_aligned

    rng = np.random.RandomState(2)
    for win, stride, (h_c, w_c), C in [(5, 4, (8, 6), 7), (9, 4, (6, 9), 3)]:
        N, K = 2, 30
        H, W_img = stride * h_c, stride * w_c
        feat = rng.randn(N, H, W_img, C).astype(np.float32)
        cells = rng.randint(0, h_c * w_c, (N, K)).astype(np.int32)
        cells[:, -3:] = [-1, h_c * w_c, 2**20]  # padded / out-of-range slots
        centers = np.stack(
            [cells // w_c * stride, cells % w_c * stride], -1
        ).astype(np.int32)
        for dt in (jnp.float32, jnp.bfloat16):
            f = jnp.asarray(feat).astype(dt)
            out = gather_windows_aligned(
                f, jnp.asarray(cells), (h_c, w_c), stride, win
            )
            assert out.dtype == dt
            ref = np.array(gather_windows(f, jnp.asarray(centers), win))
            ref[:, -3:] = 0.0  # aligned path zeroes out-of-range ids
            np.testing.assert_allclose(
                np.asarray(out.astype(jnp.float32)),
                np.asarray(jnp.asarray(ref).astype(jnp.float32)),
                atol=0,
            )


def test_spatial_expectation_matches_kornia_convention():
    # peaked heatmap at a known cell -> expectation at that cell's normalized coord
    W = 5
    heat = np.zeros((1, W * W), np.float32)
    # cell (row=1, col=3): kornia grid x = linspace(-1,1,W)
    heat[0, 1 * W + 3] = 1.0
    coords = np.asarray(spatial_expectation_2d(jnp.asarray(heat), W))
    lin = np.linspace(-1, 1, W)
    np.testing.assert_allclose(coords[0], [lin[3], lin[1]], atol=1e-6)
    std = np.asarray(heatmap_std(jnp.asarray(heat), jnp.asarray(coords), W))
    np.testing.assert_allclose(std[0], 2e-5, atol=1e-5)  # ~sqrt(1e-10)*2


def test_loftr_encoder_layer_matches_torch_reference():
    """Full encoder-layer parity: a torch implementation of the reference
    LoFTREncoderLayer (QKV linear attention + merge + concat-MLP + two
    LayerNorms, ``loftr_module/transformer.py:7-70``) vs our Flax layer with
    weights carried over via the checkpoint converter's mapping rules."""
    import jax
    import torch.nn as nn

    from onepose_plus_plus_tpu.models.transformer import LoFTREncoderLayer

    d_model, nhead = 32, 4
    n, l, s = 2, 12, 10
    rng = np.random.RandomState(0)
    x = rng.randn(n, l, d_model).astype(np.float32)
    src = rng.randn(n, s, d_model).astype(np.float32)

    class TorchLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.dim = d_model // nhead
            self.nhead = nhead
            self.q_proj = nn.Linear(d_model, d_model, bias=False)
            self.k_proj = nn.Linear(d_model, d_model, bias=False)
            self.v_proj = nn.Linear(d_model, d_model, bias=False)
            self.merge = nn.Linear(d_model, d_model, bias=False)
            self.mlp = nn.Sequential(
                nn.Linear(d_model * 2, d_model * 2, bias=False),
                nn.ReLU(),
                nn.Linear(d_model * 2, d_model, bias=False),
            )
            self.norm1 = nn.LayerNorm(d_model)
            self.norm2 = nn.LayerNorm(d_model)

        def forward(self, x, source):
            bs = x.size(0)
            q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
            k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
            v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
            # reference LinearAttention (elu+1 feature map, 1/len v scaling)
            Q = torch.nn.functional.elu(q) + 1.0
            K = torch.nn.functional.elu(k) + 1.0
            v_length = v.size(1)
            values = v / v_length
            KV = torch.einsum("nshd,nshv->nhdv", K, values)
            Z = 1.0 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
            msg = (
                torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
            ).contiguous()
            msg = self.merge(msg.view(bs, -1, self.nhead * self.dim))
            msg = self.norm1(msg)
            msg = self.mlp(torch.cat([x, msg], dim=2))
            msg = self.norm2(msg)
            return x + msg

    torch.manual_seed(0)
    tlayer = TorchLayer().eval()
    with torch.no_grad():
        ref = tlayer(torch.from_numpy(x), torch.from_numpy(src)).numpy()

    layer = LoFTREncoderLayer(d_model, nhead, "linear")
    variables = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(src)
    )
    # carry torch weights over with the converter's layout rules
    sd = tlayer.state_dict()
    p = {
        "q_proj": {"kernel": sd["q_proj.weight"].numpy().T},
        "k_proj": {"kernel": sd["k_proj.weight"].numpy().T},
        "v_proj": {"kernel": sd["v_proj.weight"].numpy().T},
        "merge": {"kernel": sd["merge.weight"].numpy().T},
        "mlp_0": {"kernel": sd["mlp.0.weight"].numpy().T},
        "mlp_1": {"kernel": sd["mlp.2.weight"].numpy().T},
        "norm1": {
            "scale": sd["norm1.weight"].numpy(),
            "bias": sd["norm1.bias"].numpy(),
        },
        "norm2": {
            "scale": sd["norm2.weight"].numpy(),
            "bias": sd["norm2.bias"].numpy(),
        },
    }
    ours = np.asarray(
        layer.apply({"params": p}, jnp.asarray(x), jnp.asarray(src))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_resnet_basic_block_matches_torch():
    """BasicBlock (conv-BN-relu x2 + residual) parity against a torch twin
    with converted weights (eval mode / running stats)."""
    import jax
    import torch.nn as nn

    from onepose_plus_plus_tpu.models.backbone import BasicBlock
    from onepose_plus_plus_tpu.utils import convert_torch_state_dict

    planes, stride = 8, 2
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)

    class TorchBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(4, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(4, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(self.downsample(x) + y)

    torch.manual_seed(1)
    tb = TorchBlock()
    # randomize running stats so the test covers them
    with torch.no_grad():
        for bn in (tb.bn1, tb.bn2, tb.downsample[1]):
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    tb.eval()
    with torch.no_grad():
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)

    block = BasicBlock(planes, stride)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted, report = convert_torch_state_dict(tb.state_dict(), variables)
    assert not report["skipped"], report["skipped"]
    ours = np.asarray(block.apply(converted, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_keypoint_encoder_matches_torch_reference():
    """KeypointEncoding_linear parity: torch Linear+InstanceNorm1d-quirk MLP
    (reference position_encoding.py:46-79) vs our Flax KeypointEncoder."""
    import jax
    import torch.nn as nn

    from onepose_plus_plus_tpu.models.position_encoding import KeypointEncoder

    layers, feat_dim = (8, 16), 24
    n, l = 2, 10
    rng = np.random.RandomState(2)
    kpts = rng.randn(n, l, 3).astype(np.float32)
    desc = rng.randn(n, l, feat_dim).astype(np.float32)

    mods = []
    dims = [3] + list(layers) + [feat_dim]
    for i in range(1, len(dims)):
        mods.append(nn.Linear(dims[i - 1], dims[i], bias=True))
        if i < len(dims) - 1:
            mods.append(nn.InstanceNorm1d(dims[i]))
            mods.append(nn.ReLU())
    torch.manual_seed(3)
    tmlp = nn.Sequential(*mods).eval()
    with torch.no_grad():
        # reference forward: descriptors [B, C, L] + encoder(kpts).transpose
        enc = tmlp(torch.from_numpy(kpts))
        ref = desc + enc.numpy()

    ours_mod = KeypointEncoder(layers=layers, feature_dim=feat_dim)
    p = {}
    li = 0
    for m in mods:
        if isinstance(m, nn.Linear):
            p[f"dense_{li}"] = {
                "kernel": m.weight.detach().numpy().T,
                "bias": m.bias.detach().numpy(),
            }
            li += 1
    ours = np.asarray(
        ours_mod.apply({"params": p}, jnp.asarray(kpts), jnp.asarray(desc))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_sine_pe_matches_torch_reference():
    """PositionEncodingSine parity with the reference formula, INCLUDING the
    pre-fix operator-precedence quirk `(-log(1e4) / d_model // 2)` that
    released checkpoints were trained with (position_encoding.py:22-33)."""
    import math

    from onepose_plus_plus_tpu.models.position_encoding import (
        sine_position_encoding,
    )

    d_model, h, w = 16, 6, 5
    # reference construction (pre-fix variant, temp_bug_fix=False)
    pe = torch.zeros((d_model, 32, 32))
    y_position = torch.ones((32, 32)).cumsum(0).float().unsqueeze(0)
    x_position = torch.ones((32, 32)).cumsum(1).float().unsqueeze(0)
    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float()
        * (-math.log(10000.0) / d_model // 2)
    )
    div_term = div_term[:, None, None]
    pe[0::4] = torch.sin(x_position * div_term)
    pe[1::4] = torch.cos(x_position * div_term)
    pe[2::4] = torch.sin(y_position * div_term)
    pe[3::4] = torch.cos(y_position * div_term)
    ref = pe[:, :h, :w].numpy().transpose(1, 2, 0)  # [h, w, C]

    x = np.zeros((1, h, w, d_model), np.float32)
    ours = np.asarray(
        sine_position_encoding(jnp.asarray(x), temp_bug_fix=False)
    )[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)

