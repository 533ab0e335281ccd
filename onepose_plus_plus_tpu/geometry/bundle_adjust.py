"""Bundle adjustment (extrinsics-only) + two-view relative pose estimation.

TPU-native replacements for the remaining COLMAP C++ entry points:

  * :func:`refine_extrinsics` — the reference's global BA
    (``src/sfm_utils/global_ba.py:9-38`` runs COLMAP ``bundle_adjuster`` with
    ONLY extrinsics refined, 50 iterations). With 3D points fixed, every
    camera pose is an independent 6-DoF nonlinear least squares -> one
    vmapped LM solve over all cameras simultaneously.
  * :func:`estimate_relative_pose` — RANSAC 8-point essential matrix +
    cheirality-resolved decomposition, the seed step of the unknown-pose
    incremental mapper (COLMAP ``mapper`` replacement in
    :mod:`..sfm.incremental`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .levenberg_marquardt import lm_solve
from .rotations import angle_axis_to_matrix, matrix_to_angle_axis
from .triangulation import triangulate_two_view

_EPS = 1e-9


# ------------------------- extrinsics-only refinement ------------------------


def _cam_residual(params, pts3d, uv, K, valid):
    """6-dof pose residual for one camera: params = [aa(3), t(3)]."""
    R = angle_axis_to_matrix(params[:3])
    t = params[3:]
    pc = pts3d @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2:3]) < _EPS, _EPS, pc[:, 2:3])
    xy = pc[:, :2] / z
    u = K[0, 0] * xy[:, 0] + K[0, 2]
    v = K[1, 1] * xy[:, 1] + K[1, 2]
    r = (jnp.stack([u, v], -1) - uv) * valid[:, None].astype(uv.dtype)
    return r.reshape(-1)


@partial(jax.jit, static_argnames=("max_iters",))
def refine_extrinsics(
    T_init: jnp.ndarray,
    K: jnp.ndarray,
    pts3d: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    max_iters: int = 50,
):
    """Refine every camera's pose against its fixed 3D observations.

    Args:
        T_init: [C, 4, 4] initial world->cam poses.
        K: [C, 3, 3]; pts3d: [C, M, 3] per-camera observed points (padded);
        uv: [C, M, 2] observations; valid: [C, M].
    Returns:
        (T_refined [C, 4, 4], final cost [C]).
    """
    aa = matrix_to_angle_axis(T_init[:, :3, :3])
    x0 = jnp.concatenate([aa, T_init[:, :3, 3]], axis=1)  # [C, 6]
    x, cost = lm_solve(
        _cam_residual, x0, (pts3d, uv, K, valid), max_iters=max_iters
    )
    R = angle_axis_to_matrix(x[:, :3])
    T = jnp.tile(jnp.eye(4, dtype=T_init.dtype), (T_init.shape[0], 1, 1))
    T = T.at[:, :3, :3].set(R).at[:, :3, 3].set(x[:, 3:])
    # reject non-finite solutions
    ok = jnp.all(jnp.isfinite(x), axis=1)
    T = jnp.where(ok[:, None, None], T, T_init)
    return T, cost


# ------------------------- two-view relative pose ---------------------------


class RelativePose(NamedTuple):
    R: jnp.ndarray  # [3, 3] cam0->cam1
    t: jnp.ndarray  # [3] unit-norm translation
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray
    ok: jnp.ndarray


def _essential_8pt(
    p0n: jnp.ndarray, p1n: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Normalized 8-point: E from [S>=8, 2] normalized correspondences
    (optionally weighted — used for the consensus-set refit)."""
    x0, y0 = p0n[:, 0], p0n[:, 1]
    x1, y1 = p1n[:, 0], p1n[:, 1]
    ones = jnp.ones_like(x0)
    # rows for x1^T E x0 = 0, E row-major
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=1
    )  # [S, 9]
    if weights is not None:
        A = A * weights[:, None]
    _, vecs = jnp.linalg.eigh(A.T @ A)
    E = vecs[:, 0].reshape(3, 3)
    # project onto essential manifold: singular values (1, 1, 0)
    U, _, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def _decompose_E(E: jnp.ndarray):
    """Four (R, t) candidates from E."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U @ Vt)
    U = U * jnp.sign(d)  # keep det(R) = +1 without branching
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def _sampson_normalized(E, p0n, p1n):
    ones = jnp.ones_like(p0n[:, :1])
    x0 = jnp.concatenate([p0n, ones], axis=1)
    x1 = jnp.concatenate([p1n, ones], axis=1)
    Ex0 = x0 @ E.T
    Etx1 = x1 @ E
    x1Ex0 = jnp.sum(x1 * Ex0, axis=1)
    denom = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return (x1Ex0**2) / (denom + _EPS)


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def estimate_relative_pose(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    threshold_px: float = 4.0,
    num_hypotheses: int = 256,
    sample_size: int = 8,
) -> RelativePose:
    """RANSAC essential-matrix relative pose from pixel correspondences.

    The seed step of the unknown-pose mapper (replaces COLMAP two-view
    initialization). Translation is unit-scale (monocular gauge freedom).
    """
    n = pts0.shape[0]

    def normalize(p, K):
        return jnp.stack(
            [(p[:, 0] - K[0, 2]) / K[0, 0], (p[:, 1] - K[1, 2]) / K[1, 1]], 1
        )

    p0n = normalize(pts0, K0)
    p1n = normalize(pts1, K1)
    f_mean = 0.25 * (K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1])
    thr2 = (threshold_px / f_mean) ** 2

    g = jax.random.gumbel(rng, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)
    Eh = jax.vmap(_essential_8pt)(p0n[idx], p1n[idx])  # [H, 3, 3]
    errs = jax.vmap(lambda E: _sampson_normalized(E, p0n, p1n))(Eh)  # [H, N]
    inl = (errs <= thr2) & valid[None]
    counts = jnp.sum(inl, axis=1)
    finite = jnp.all(jnp.isfinite(Eh), axis=(1, 2))
    best = jnp.argmax(jnp.where(finite, counts, -1))
    inliers0 = inl[best]
    # consensus refit on all inliers, then a second inlier pass
    E = _essential_8pt(p0n, p1n, inliers0.astype(p0n.dtype))
    errs_f = _sampson_normalized(E, p0n, p1n)
    inliers = (errs_f <= thr2) & valid

    # cheirality: pick the (R, t) with most points in front of both cameras
    cands = _decompose_E(E)

    def count_front(Rt):
        R, t = Rt
        T0 = jnp.eye(4)
        T1 = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
        Keye = jnp.eye(3)
        xyz = triangulate_two_view(
            Keye[None], Keye[None], T0[None], T1[None], p0n[None], p1n[None]
        )[0]
        z0 = xyz[:, 2]
        pc1 = xyz @ R.T + t
        front = (z0 > 0) & (pc1[:, 2] > 0) & inliers
        return jnp.sum(front)

    counts4 = jnp.stack([count_front(c) for c in cands])
    k = jnp.argmax(counts4)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R, t = Rs[k], ts[k]
    num = jnp.sum(inliers).astype(jnp.int32)
    ok = num >= sample_size
    return RelativePose(R=R, t=t, inliers=inliers, num_inliers=num, ok=ok)
