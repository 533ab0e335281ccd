"""Incremental SfM for unknown camera poses (COLMAP ``mapper`` replacement).

The reference falls back to the full COLMAP mapping pipeline when per-frame
poses are unavailable (``src/KeypointFreeSfM/coarse_sfm/coarse_sfm_runner.py``:
``feature_importer``/``matches_importer``/``mapper`` — the demo-from-scratch
path). This module rebuilds that capability on the framework's own batched
geometry solvers:

  1. seed pair: most-matched pair with a confident RANSAC essential-matrix
     relative pose (:func:`~...geometry.bundle_adjust.estimate_relative_pose`);
  2. two-view triangulation of the seed tracks;
  3. grow: repeatedly register the unregistered image with the most 2D-3D
     correspondences via RANSAC-PnP, triangulate newly-completable tracks,
     and periodically re-refine all extrinsics (vmapped per-camera LM);
  4. final extrinsics-only refinement (the reference's optional global BA,
     ``global_ba.py``).

The registration loop is host-driven (camera count is small); every geometric
solve inside is a batched device program.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.bundle_adjust import estimate_relative_pose, refine_extrinsics
from ..geometry.pnp import ransac_pnp
from ..geometry.triangulation import triangulate_and_filter
from .coarse_match import SceneKeypoints
from .tracks import build_tracks, tracks_to_arrays

Pair = Tuple[int, int]


def _triangulate_tracks_subset(
    tracks: List[Dict[int, int]],
    track_ids: List[int],
    keypoints: Dict[int, np.ndarray],
    Ks: Dict[int, np.ndarray],
    poses: Dict[int, np.ndarray],
    max_track_length: int,
    max_reproj_px: float,
):
    """Triangulate the given tracks using only registered observations."""
    sub = []
    for ti in track_ids:
        obs = {im: k for im, k in tracks[ti].items() if im in poses}
        if len(obs) >= 2:
            sub.append((ti, obs))
    if not sub:
        return {}
    pack = tracks_to_arrays(
        [obs for _, obs in sub],
        keypoints,
        Ks,
        poses,
        max_track_length,
    )
    xyz, obs_inl, ok, err = triangulate_and_filter(
        jnp.asarray(pack["K"]),
        jnp.asarray(pack["T_w2c"]),
        jnp.asarray(pack["uv"]),
        jnp.asarray(pack["valid"]),
        max_reproj_px=max_reproj_px,
    )
    out = {}
    ok = np.asarray(ok)
    xyz = np.asarray(xyz)
    for row, (ti, _) in enumerate(sub):
        if ok[row]:
            out[ti] = xyz[row]
    return out


def incremental_sfm(
    scene: SceneKeypoints,
    Ks: Dict[int, np.ndarray],
    min_seed_matches: int = 50,
    min_pnp_correspondences: int = 12,
    pnp_capacity: int = 2048,
    reproj_threshold_px: float = 4.0,
    max_track_length: int = 16,
    refine_every: int = 3,
    rng_seed: int = 0,
) -> dict:
    """Map a scene with unknown poses from pairwise matches.

    Returns dict with ``poses`` {img_id: [4, 4] world->cam}, ``points``
    {track_idx: xyz}, ``tracks`` (the track list), and ``registered`` order.
    Scale is the monocular gauge (seed baseline = 1).
    """
    rng = jax.random.PRNGKey(rng_seed)
    counts = {i: len(k) for i, k in scene.keypoints.items()}
    tracks = build_tracks(counts, scene.match_indices, scene.match_confs)
    # track lookup per (img, kpt)
    obs_to_track: Dict[Tuple[int, int], int] = {}
    for ti, obs in enumerate(tracks):
        for im, k in obs.items():
            obs_to_track[(im, k)] = ti

    # --- 1. seed pair
    pair_order = sorted(
        scene.match_indices, key=lambda p: -len(scene.match_indices[p])
    )
    poses: Dict[int, np.ndarray] = {}
    points: Dict[int, np.ndarray] = {}
    registered: List[int] = []
    for pair in pair_order:
        m = scene.match_indices[pair]
        if len(m) < min_seed_matches:
            continue
        i, j = pair
        p0 = scene.keypoints[i][m[:, 0]].astype(np.float32)
        p1 = scene.keypoints[j][m[:, 1]].astype(np.float32)
        cap = max(64, 1 << int(np.ceil(np.log2(len(p0)))))
        p0p = np.zeros((cap, 2), np.float32)
        p1p = np.zeros((cap, 2), np.float32)
        vmask = np.zeros(cap, bool)
        p0p[: len(p0)] = p0
        p1p[: len(p1)] = p1
        vmask[: len(p0)] = True
        rng, sub = jax.random.split(rng)
        rel = estimate_relative_pose(
            jnp.asarray(p0p),
            jnp.asarray(p1p),
            jnp.asarray(Ks[i].astype(np.float32)),
            jnp.asarray(Ks[j].astype(np.float32)),
            jnp.asarray(vmask),
            sub,
            threshold_px=reproj_threshold_px,
        )
        if not bool(rel.ok) or int(rel.num_inliers) < min_seed_matches // 2:
            continue
        poses[i] = np.eye(4)
        T1 = np.eye(4)
        T1[:3, :3] = np.asarray(rel.R)
        T1[:3, 3] = np.asarray(rel.t)
        poses[j] = T1
        registered = [i, j]
        break
    if not registered:
        return {"poses": {}, "points": {}, "tracks": tracks, "registered": []}

    # --- 2. seed triangulation
    points.update(
        _triangulate_tracks_subset(
            tracks,
            list(range(len(tracks))),
            scene.keypoints,
            Ks,
            poses,
            max_track_length,
            reproj_threshold_px,
        )
    )

    # --- 3. grow
    all_imgs = sorted(scene.keypoints.keys())
    since_refine = 0
    while True:
        # image with most 2D-3D correspondences
        best_img, best_corr = None, []
        for im in all_imgs:
            if im in poses:
                continue
            corr = []
            for k in range(counts[im]):
                ti = obs_to_track.get((im, k))
                if ti is not None and ti in points:
                    corr.append((k, ti))
            if len(corr) > len(best_corr):
                best_img, best_corr = im, corr
        if best_img is None or len(best_corr) < min_pnp_correspondences:
            break

        corr = best_corr[:pnp_capacity]
        cap = max(64, 1 << int(np.ceil(np.log2(len(corr)))))
        p3 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 2), np.float32)
        vmask = np.zeros(cap, bool)
        for s, (k, ti) in enumerate(corr):
            p3[s] = points[ti]
            p2[s] = scene.keypoints[best_img][k]
            vmask[s] = True
        rng, sub = jax.random.split(rng)
        res = ransac_pnp(
            jnp.asarray(p3),
            jnp.asarray(p2),
            jnp.asarray(Ks[best_img].astype(np.float32)),
            jnp.asarray(vmask),
            sub,
            reproj_threshold_px=reproj_threshold_px,
        )
        if not bool(res.ok):
            all_imgs.remove(best_img)  # unregistrable; stop retrying it
            continue
        T = np.eye(4)
        T[:3, :3] = np.asarray(res.R)
        T[:3, 3] = np.asarray(res.t)
        poses[best_img] = T
        registered.append(best_img)
        since_refine += 1

        # triangulate tracks that just became completable
        fresh = [
            obs_to_track[(best_img, k)]
            for k in range(counts[best_img])
            if (best_img, k) in obs_to_track
            and obs_to_track[(best_img, k)] not in points
        ]
        points.update(
            _triangulate_tracks_subset(
                tracks,
                fresh,
                scene.keypoints,
                Ks,
                poses,
                max_track_length,
                reproj_threshold_px,
            )
        )

        if since_refine >= refine_every:
            since_refine = 0
            _refine_all(poses, points, tracks, scene, Ks, pnp_capacity)

    # --- 4. final refinement
    _refine_all(poses, points, tracks, scene, Ks, pnp_capacity)
    # re-triangulate everything with final poses
    points = _triangulate_tracks_subset(
        tracks,
        list(range(len(tracks))),
        scene.keypoints,
        Ks,
        poses,
        max_track_length,
        reproj_threshold_px,
    )
    return {
        "poses": poses,
        "points": points,
        "tracks": tracks,
        "registered": registered,
    }


def _refine_all(poses, points, tracks, scene, Ks, capacity):
    """Extrinsics-only refinement of all registered cameras (points fixed)."""
    imgs = sorted(poses.keys())
    if not imgs:
        return
    m = capacity
    c = len(imgs)
    p3 = np.zeros((c, m, 3), np.float32)
    uv = np.zeros((c, m, 2), np.float32)
    Karr = np.zeros((c, 3, 3), np.float32)
    valid = np.zeros((c, m), bool)
    Tarr = np.zeros((c, 4, 4), np.float32)
    for ci, im in enumerate(imgs):
        Karr[ci] = Ks[im]
        Tarr[ci] = poses[im]
        s = 0
        for ti, obs in enumerate(tracks):
            if s >= m:
                break
            if ti in points and im in obs:
                p3[ci, s] = points[ti]
                uv[ci, s] = scene.keypoints[im][obs[im]]
                valid[ci, s] = True
                s += 1
    T_ref, _ = refine_extrinsics(
        jnp.asarray(Tarr),
        jnp.asarray(Karr),
        jnp.asarray(p3),
        jnp.asarray(uv),
        jnp.asarray(valid),
    )
    T_ref = np.asarray(T_ref)
    for ci, im in enumerate(imgs):
        poses[im] = T_ref[ci]
