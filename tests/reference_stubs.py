"""Import shims so the reference torch model can be instantiated here.

The environment has torch but lacks kornia / loguru / timm /
pytorch_lightning. The reference OnePosePlus model
(``/root/reference/src/models/OnePosePlus``) touches only tiny corners of
each, re-implemented below so the *unmodified* reference source can be
imported for full-model conversion + forward-parity tests (the parity gate
for ever using released checkpoints).

Only the reference's 2D-3D matcher is importable: the image-pair LoFTR lives
in a non-vendored git submodule (``.gitmodules``), so no torch source for it
exists in this environment.
"""
from __future__ import annotations

import contextlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    """Idempotently register stub modules + the reference root on sys.path."""
    if "loguru" not in sys.modules:
        loguru = _module("loguru")

        class _Logger:
            def __getattr__(self, _name):
                return lambda *a, **kw: None

        loguru.logger = _Logger()

    if "timm" not in sys.modules:
        timm = _module("timm")
        models = _module("timm.models")
        registry = _module("timm.models.registry")
        registry.register_model = lambda fn: fn
        models.registry = registry
        timm.models = models

    if "kornia" not in sys.modules:
        import torch

        kornia = _module("kornia")
        geometry = _module("kornia.geometry")
        subpix = _module("kornia.geometry.subpix")
        utils = _module("kornia.utils")
        grid_mod = _module("kornia.utils.grid")

        def create_meshgrid(
            height, width, normalized_coordinates=True, device=None, dtype=None
        ):
            dtype = dtype or torch.float32
            if normalized_coordinates:
                xs = torch.linspace(-1.0, 1.0, width, device=device, dtype=dtype)
                ys = torch.linspace(-1.0, 1.0, height, device=device, dtype=dtype)
            else:
                xs = torch.arange(width, device=device, dtype=dtype)
                ys = torch.arange(height, device=device, dtype=dtype)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], dim=-1).unsqueeze(0)  # [1, H, W, 2]

        dsnt = _module("kornia.geometry.subpix.dsnt")

        def spatial_expectation2d(input, normalized_coordinates=True):
            b, n, h, w = input.shape
            grid = create_meshgrid(
                h, w, normalized_coordinates, input.device, input.dtype
            ).reshape(1, 1, h * w, 2)
            return (input.reshape(b, n, h * w, 1) * grid).sum(dim=2)

        dsnt.spatial_expectation2d = spatial_expectation2d
        subpix.dsnt = dsnt
        geometry.subpix = subpix
        kornia.geometry = geometry
        grid_mod.create_meshgrid = create_meshgrid
        utils.grid = grid_mod
        kornia.utils = utils

    if "src.utils.profiler" not in sys.modules:
        prof = _module("src.utils.profiler")

        class PassThroughProfiler:
            # the reference sometimes stores the *class* (CoarseMatching) and
            # sometimes an instance (OnePosePlus_model) — staticmethod serves both
            @staticmethod
            @contextlib.contextmanager
            def record_function(_name):
                yield

            @staticmethod
            @contextlib.contextmanager
            def profile(_name):
                yield

        prof.PassThroughProfiler = PassThroughProfiler

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


# Reference configs/experiment/train.yaml:44-127 as the plain dict the torch
# model consumes (pretrained backbone load disabled: no weights in this env).
REF_ONEPOSE_CONFIG = {
    "loftr_backbone": {
        "type": "ResNetFPN",
        "resolution": [8, 2],
        "resnetfpn": {
            "block_type": "BasicBlock",
            "initial_dim": 128,
            "block_dims": [128, 196, 256],
            "output_layers": [3, 1],
        },
        "pretrained": None,
        "pretrained_fix": False,
    },
    "interpol_type": "bilinear",
    "keypoints_encoding": {
        "enable": True,
        "type": "mlp_linear",
        "descriptor_dim": 256,
        "keypoints_encoder": [32, 64, 128],
        "norm_method": "instancenorm",
    },
    "positional_encoding": {"enable": True, "pos_emb_shape": [256, 256]},
    "loftr_coarse": {
        "type": "LoFTR",
        "d_model": 256,
        "d_ffm": 128,
        "nhead": 8,
        "layer_names": ["self", "cross"],
        "layer_iter_n": 3,
        "dropout": 0.0,
        "attention": "linear",
        "norm_method": "layernorm",
        "kernel_fn": "elu + 1",
        "d_kernel": 16,
        "redraw_interval": 2,
        "rezero": None,
        "final_proj": False,
    },
    "coarse_matching": {
        "type": "dual-softmax",
        "thr": 0.1,
        "feat_norm_method": "sqrt_feat_dim",
        "border_rm": 2,
        "dual_softmax": {"temperature": 0.08},
        "train": {
            "train_padding": True,
            "train_coarse_percent": 0.3,
            "train_pad_num_gt_min": 200,
        },
    },
    "loftr_fine": {
        "enable": True,
        "window_size": 5,
        "coarse_layer_norm": False,
        "type": "LoFTR",
        "d_model": 128,
        "nhead": 8,
        "layer_names": ["self", "cross"],
        "layer_iter_n": 1,
        "dropout": 0.0,
        "attention": "linear",
        "norm_method": "layernorm",
        "kernel_fn": "elu + 1",
        "d_kernel": 16,
        "redraw_interval": 2,
        "rezero": None,
        "final_proj": False,
    },
    "fine_matching": {"enable": True, "type": "s2d", "s2d": {"type": "heatmap"}},
}


def build_reference_onepose_model(seed: int = 0, config: dict | None = None):
    """Instantiate the unmodified reference torch model (random init, eval)."""
    install_reference_stubs()
    import torch

    from src.models.OnePosePlus.OnePosePlusModel import OnePosePlus_model

    torch.manual_seed(seed)
    model = OnePosePlus_model(config or REF_ONEPOSE_CONFIG)
    model.eval()
    return model
