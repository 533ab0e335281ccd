"""Checkpointing: orbax-backed save/load + torch-checkpoint conversion.

Replaces the reference's PL ModelCheckpoint + ``src/utils/model_io.py``
(ckpt load with prefix surgery, strict->non-strict fallback,
``OnePosePlus_lightning_model.py:33-49``) with:

  * :func:`save_checkpoint` / :func:`load_checkpoint` — orbax PyTree
    checkpoints of flax variables / train state;
  * :func:`convert_torch_state_dict` — maps a released PyTorch OnePose++ /
    LoFTR state dict onto this framework's flax variable tree
    (name translation + OIHW->HWIO / [out,in]->[in,out] transposition +
    BN running-stat routing). The weight-conversion fidelity notes in
    SURVEY.md §7.3 (BN stats, instance-norm kpt encoder, sine-PE variant)
    are handled by construction: module names match the reference layout.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


# ------------------------------ orbax wrappers ------------------------------


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (variables / train state) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Load a pytree; ``target`` (same structure) restores concrete dtypes.

    Without ``target`` the tree is restored as host numpy arrays: orbax
    records the saving process's device shardings, and a bare restore fails
    whenever the loading process has a different topology (e.g. a checkpoint
    written on an 8-virtual-device CPU mesh loaded on the single real chip).
    """
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    return ckptr.restore(path, restore_args=restore_args)


def save_train_state(path: str, state: Any, epoch: int) -> None:
    """Full training-state checkpoint for resume: params + batch_stats +
    opt_state + step + next epoch. Equivalent of the reference's PL
    ``resume_from_checkpoint`` (``OnePosePlus_lightning_model.py:120``,
    ModelCheckpoint ``train.yaml:204-213``) which round-trips optimizer state
    and global step, not just weights."""
    save_checkpoint(
        path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": jnp.asarray(epoch, jnp.int32),
        },
    )


def restore_train_state(path: str, state: Any) -> Tuple[Any, int]:
    """Restore a ``save_train_state`` checkpoint into ``state`` (used as the
    structure/dtype template). Returns (state, next_epoch)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": jnp.zeros((), jnp.int32),
    }
    tree = load_checkpoint(path, target=template)
    state = state.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        step=tree["step"],
    )
    return state, int(tree["epoch"])


# --------------------------- torch ckpt conversion --------------------------


def _strip_prefix(name: str) -> str:
    """Remove PL/OnePose wrapper prefixes (reference load_network surgery)."""
    for p in ("model.", "matcher.", "module."):
        if name.startswith(p):
            name = name[len(p) :]
    return name


def _torch_name_to_flax_path(name: str) -> Tuple[Tuple[str, ...], str]:
    """Translate one torch parameter name to (flax path, kind).

    kind in {'conv', 'linear', 'bn_scale', 'bn_bias', 'bn_mean', 'bn_var',
    'norm_scale', 'norm_bias', 'bias', 'other'} controls the tensor layout
    transform applied by :func:`convert_torch_state_dict`.
    """
    name = _strip_prefix(name)
    parts = name.split(".")
    tail = parts[-1]

    # torch "layerX.N" -> flax "layerX_N" (submodule list flattening)
    joined = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p == "kpt_3d_pos_encoding":
            joined.append("kpt_encoder")
            i += 1
            continue
        if (
            i + 1 < len(parts) - 1
            and re.fullmatch(r"layer\d+_outconv2", p)
            and parts[i + 1].isdigit()
        ):
            # FPN refine Sequential(conv3x3, BN, LeakyReLU, conv3x3)
            # (reference resnet.py layerN_outconv2) -> _OutConv2{conv1,bn,conv2}
            joined.append(p)
            joined.append({0: "conv1", 1: "bn", 3: "conv2"}[int(parts[i + 1])])
            i += 2
            continue
        if (
            i + 1 < len(parts) - 1
            and p == "encoder"
            and parts[i + 1].isdigit()
        ):
            # KeypointEncoding_linear MLP Sequential (Linear at 0,3,6,9 with
            # param-free InstanceNorm1d + ReLU between) -> dense_{0..3}
            joined.append(f"dense_{int(parts[i + 1]) // 3}")
            i += 2
            continue
        if (
            i + 1 < len(parts) - 1
            and re.fullmatch(r"layers?|layer\d+|mlp|downsample", p)
            and parts[i + 1].isdigit()
        ):
            if p == "layers":  # transformer stacks: layers.N -> layer_N
                joined.append(f"layer_{parts[i + 1]}")
            elif p == "mlp":  # mlp.0 / mlp.2 -> mlp_0 / mlp_1 (skip act idx)
                idx = int(parts[i + 1])
                joined.append(f"mlp_{0 if idx == 0 else 1}")
            elif p == "downsample":  # downsample.0/.1 -> conv / bn
                idx = int(parts[i + 1])
                joined.append("downsample_conv" if idx == 0 else "downsample_bn")
            else:  # layer1.0 -> layer1_0
                joined.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            joined.append(p)
            i += 1

    is_bn = any(
        j.startswith("bn") or j.endswith("_bn") or j == "norm" for j in joined
    ) or (joined and joined[-1].startswith("bn"))
    # LoFTR transformer layernorms are named norm1/norm2 (not BN)
    is_ln = joined and joined[-1] in ("norm1", "norm2")

    if tail == "weight":
        if is_ln:
            return tuple(joined) + ("scale",), "norm_scale"
        if is_bn:
            return tuple(joined) + ("BatchNorm_0", "scale"), "bn_scale"
        return tuple(joined) + ("kernel",), "conv_or_linear"
    if tail == "bias":
        if is_ln:
            return tuple(joined) + ("bias",), "norm_bias"
        if is_bn:
            return tuple(joined) + ("BatchNorm_0", "bias"), "bn_bias"
        return tuple(joined) + ("bias",), "bias"
    if tail == "running_mean":
        return tuple(joined) + ("BatchNorm_0", "mean"), "bn_mean"
    if tail == "running_var":
        return tuple(joined) + ("BatchNorm_0", "var"), "bn_var"
    return tuple(joined) + (tail,), "other"


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    variables: Dict[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Convert a torch state dict onto a flax ``{'params', 'batch_stats'}`` tree.

    Args:
        state_dict: name -> tensor (numpy or torch.Tensor).
        variables: the target model's initialized variables (shapes/structure).
        strict: raise if any torch tensor fails to map.
    Returns:
        (new_variables, report) where report lists 'converted', 'skipped'
        (torch params with no flax home), 'missing' (flax leaves untouched).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    converted, skipped = [], []

    for name, tensor in state_dict.items():
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        if "num_batches_tracked" in name:
            continue
        path, kind = _torch_name_to_flax_path(name)
        target_tree = (
            batch_stats if kind in ("bn_mean", "bn_var") else params
        )
        cur = _get_path(target_tree, path)
        if cur is None:
            skipped.append(name)
            if strict:
                raise KeyError(f"no flax home for torch param {name} -> {path}")
            continue
        if kind == "conv_or_linear":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 3:  # conv1d OIW -> WIO... flax Dense from conv1d k=1
                arr = arr[:, :, 0].T
            elif arr.ndim == 2:  # linear [out, in] -> [in, out]
                arr = arr.T
        if arr.shape != np.shape(cur):
            skipped.append(name)
            if strict:
                raise ValueError(
                    f"shape mismatch for {name}: torch {arr.shape} vs flax "
                    f"{np.shape(cur)} at {path}"
                )
            continue
        _set_path(target_tree, path, jnp.asarray(arr))
        converted.append(name)

    # untouched flax leaves
    import jax.tree_util as jtu

    missing = []
    for tree, tag in ((params, "params"), (batch_stats, "batch_stats")):
        for kp, leaf in jtu.tree_flatten_with_path(tree)[0]:
            if isinstance(leaf, np.ndarray):
                missing.append(
                    tag + "/" + "/".join(str(getattr(p, "key", p)) for p in kp)
                )

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    for k, v in variables.items():
        if k not in out:
            out[k] = v
    report = {"converted": converted, "skipped": skipped, "missing": missing}
    return out, report


def load_torch_checkpoint(
    ckpt_path: str, variables: Dict[str, Any], strict: bool = False
):
    """Load a reference .ckpt/.pth file and convert (requires torch)."""
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_torch_state_dict(state_dict, variables, strict=strict)
