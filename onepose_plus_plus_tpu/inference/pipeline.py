"""Batched query-pose inference pipeline.

Replaces reference ``src/inference/inference_OnePosePlus.py`` +
``inference_OnePosePlus_worker.py`` (2 Ray workers x 0.5 GPU, one frame at a
time through model forward + pycolmap/cv2 PnP). TPU-native design: the whole
per-frame chain — 2D-3D matching forward AND RANSAC-PnP AND pose-error
computation — is ONE jitted, batched device program; frames stream through in
batches of ``frame_batch`` and the host only does IO. This fused
forward+solve step is the framework's headline throughput path
(BASELINE.json north star).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OnePosePlusConfig
from ..eval.metrics import aggregate_metrics, batched_pose_errors
from ..geometry.pnp import PnPResult, ransac_pnp
from ..models.onepose_plus import OnePosePlusModel


@dataclasses.dataclass
class InferenceResult:
    poses: np.ndarray  # [F, 4, 4] predicted world->cam
    num_inliers: np.ndarray  # [F]
    ok: np.ndarray  # [F] bool
    num_matches: Optional[np.ndarray] = None  # [F] confident matches into PnP
    R_errs: Optional[np.ndarray] = None  # [F] deg (when GT given)
    t_errs: Optional[np.ndarray] = None  # [F] cm
    metrics: Optional[dict] = None


def make_query_step(
    model: OnePosePlusModel,
    variables,
    reproj_threshold_px: float = 3.3,
    num_hypotheses: int = 512,
    conf_threshold: float = 0.0,
    planar_hypotheses: bool = True,
    p3p_hypotheses: bool = True,
    p3p_samples: int = 128,
    prescore_subset: int = 128,
    rescore_top: int = 64,
):
    """Build the jitted batched (match + PnP [+ errors]) device step.

    Returns fn(batch_dict, rng, pose_gt or None) ->
        (poses [B, 4, 4], num_inliers [B], ok [B], R_err [B], t_err [B],
        num_matches [B] — confident matches fed to PnP, the held-out
        diagnosis signal: low num_matches = matcher failure, high
        num_matches with low num_inliers = pose-path/threshold failure).
    ``batch_dict`` carries query_image [B, H, W, 1], keypoints3d [B, S, 3],
    descriptors3d [B, S, 128], descriptors3d_coarse [B, S, 256], intrinsics
    [B, 3, 3]; GT errors are NaN when pose_gt is None.
    """

    @jax.jit
    def step(batch, rng, pose_gt):
        batch = dict(batch)
        img = batch["query_image"]
        if img.dtype == jnp.uint8:
            # uint8 transfer + on-device /255: quarters the H2D payload and
            # is bit-identical to the reference host-side normalization
            # (source frames are uint8; data_io.py loads then divides)
            batch["query_image"] = img.astype(jnp.float32) / 255.0
        b = img.shape[0]
        for k in ("keypoints3d", "descriptors3d", "descriptors3d_coarse"):
            # the object's point cloud is frame-invariant: accept it unbatched
            # ([S, ...], uploaded once per object) and broadcast on device
            # instead of tiling [B, S, ...] through the host each chunk
            if k in batch and batch[k].ndim == 2:
                batch[k] = jnp.broadcast_to(
                    batch[k][None], (b,) + batch[k].shape
                )
        out = model.apply(variables, batch, train=False)
        mkpts3d = out["mkpts_3d"]  # [B, K, 3]
        mkpts2d = out["mkpts_query_f"]  # [B, K, 2]
        mconf = out["mconf"]
        mask = out["match_mask"].astype(bool) & (mconf > conf_threshold)

        keys = jax.random.split(rng, mkpts3d.shape[0])
        res: PnPResult = jax.vmap(
            lambda p3, p2, K, v, key: ransac_pnp(
                p3,
                p2,
                K,
                v,
                key,
                reproj_threshold_px=reproj_threshold_px,
                num_hypotheses=num_hypotheses,
                planar_hypotheses=planar_hypotheses,
                p3p_hypotheses=p3p_hypotheses,
                p3p_samples=p3p_samples,
                prescore_subset=prescore_subset,
                rescore_top=rescore_top,
            )
        )(mkpts3d, mkpts2d, batch["intrinsics"], mask, keys)

        b = mkpts3d.shape[0]
        poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
        poses = poses.at[:, :3, :3].set(res.R)
        poses = poses.at[:, :3, 3].set(res.t)
        n_match = jnp.sum(mask, axis=-1).astype(jnp.int32)

        if pose_gt is None:
            nan = jnp.full((b,), jnp.nan, jnp.float32)
            return poses, res.num_inliers, res.ok, nan, nan, n_match
        R_err, t_err = batched_pose_errors(poses, pose_gt)
        return poses, res.num_inliers, res.ok, R_err, t_err, n_match

    return step


def run_inference(
    model: OnePosePlusModel,
    variables,
    frames: Iterable[dict],
    annotation: Dict[str, np.ndarray],
    shape3d: int = 7000,
    frame_batch: int = 16,
    reproj_threshold_px: float = 3.3,
    num_hypotheses: int = 512,
    pose_thresholds=(1, 3, 5),
    rng_seed: int = 0,
    mesh=None,
    step=None,
) -> InferenceResult:
    """Run the batched query pipeline over an object's frames.

    Args:
        frames: iterable of dicts with ``image`` [H, W] float, ``K`` [3, 3],
            and optional ``pose_gt`` [4, 4].
        annotation: the object's SfM annotation — ``keypoints3d`` [m, 3],
            ``descriptors3d`` [m, 128], plus optional
            ``descriptors3d_coarse`` [m, 256] (reference
            anno_3d_average[_coarse].npz pair).
        mesh: optional ``jax.sharding.Mesh`` — the frame batch is sharded over
            the data axis and the jitted step runs SPMD across all chips
            (frame_batch must be a multiple of the mesh size).
        step: optional prebuilt device step from :func:`make_query_step` —
            REUSE it across objects with identical shapes, otherwise every
            object pays a fresh XLA compile.
    """
    from ..data.preprocessing import pad_point_cloud

    gen = np.random.default_rng(rng_seed)
    fine = pad_point_cloud(
        annotation["keypoints3d"],
        annotation["descriptors3d"],
        annotation.get("scores3d"),
        shape3d,
        gen,
    )
    if "descriptors3d_coarse" in annotation:
        coarse = pad_point_cloud(
            annotation["keypoints3d"],
            annotation["descriptors3d_coarse"],
            annotation.get("scores3d_coarse"),
            shape3d,
            np.random.default_rng(rng_seed),  # same subsample as fine
        )
        desc_c = coarse["descriptors3d"]
    else:
        desc_c = None

    if step is None:
        step = make_query_step(
            model,
            variables,
            reproj_threshold_px=reproj_threshold_px,
            num_hypotheses=num_hypotheses,
        )
    frames = list(frames)
    has_gt = all("pose_gt" in f for f in frames)
    rng = jax.random.PRNGKey(rng_seed)

    # object point cloud: ONE upload per object ([S, ...], replicated when a
    # mesh is given); the jitted step broadcasts it to the frame batch on
    # device — no per-chunk [B, S, ...] host tiling/transfer
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        put_pc = lambda x: replicate(jnp.asarray(x), mesh)
    else:
        put_pc = lambda x: jax.device_put(jnp.asarray(x))
    pc = {
        "keypoints3d": put_pc(fine["keypoints3d"]),
        "descriptors3d": put_pc(fine["descriptors3d"]),
    }
    if desc_c is not None:
        pc["descriptors3d_coarse"] = put_pc(desc_c)

    poses, inliers, oks, r_errs, t_errs, n_matches = [], [], [], [], [], []
    for s in range(0, len(frames), frame_batch):
        chunk = frames[s : s + frame_batch]
        pad = frame_batch - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        imgs = np.stack([f["image"][..., None] for f in chunk_p], 0)
        batch = {
            # uint8 frames stay uint8 over the wire (normalized in-jit)
            "query_image": jnp.asarray(
                imgs, imgs.dtype if imgs.dtype == np.uint8 else jnp.float32
            ),
            "intrinsics": jnp.asarray(
                np.stack([f["K"] for f in chunk_p], 0), jnp.float32
            ),
        }
        gt = (
            jnp.asarray(np.stack([f["pose_gt"] for f in chunk_p]), jnp.float32)
            if has_gt
            else None
        )
        if mesh is not None:
            batch = shard_batch(batch, mesh)
            if gt is not None:
                gt = shard_batch({"gt": gt}, mesh)["gt"]
        batch.update(pc)
        rng, sub = jax.random.split(rng)
        p, ni, ok, re, te, nm = step(batch, sub, gt)
        n = len(chunk)
        poses.append(np.asarray(p)[:n])
        inliers.append(np.asarray(ni)[:n])
        oks.append(np.asarray(ok)[:n])
        r_errs.append(np.asarray(re)[:n])
        t_errs.append(np.asarray(te)[:n])
        n_matches.append(np.asarray(nm)[:n])

    result = InferenceResult(
        poses=np.concatenate(poses) if poses else np.zeros((0, 4, 4)),
        num_inliers=np.concatenate(inliers) if inliers else np.zeros(0, np.int32),
        ok=np.concatenate(oks) if oks else np.zeros(0, bool),
        num_matches=np.concatenate(n_matches)
        if n_matches
        else np.zeros(0, np.int32),
    )
    if has_gt and frames:
        result.R_errs = np.concatenate(r_errs)
        result.t_errs = np.concatenate(t_errs)
        result.metrics = aggregate_metrics(
            result.R_errs, result.t_errs, pose_thresholds=pose_thresholds
        )
    return result
