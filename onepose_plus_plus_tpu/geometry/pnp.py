"""Batched RANSAC Perspective-n-Point with Gauss-Newton refinement (JAX).

TPU-native replacement for the reference's native PnP backends:
``pycolmap.absolute_pose_estimation`` (C++ RANSAC + nonlinear refine,
reference ``src/utils/metric_utils.py:130-170``) and
``cv2.solvePnPRansac`` EPnP (``metric_utils.py:181-189``, 10000 iters,
reprojection threshold per dataset, 3D points scaled x1000).

Design (SURVEY.md §2.4): a fixed count of minimal-sample hypotheses is solved
in parallel (vmapped finite P3P via Lambda-Twist-style quadratic elimination is
replaced by a simpler, equally batched approach: each hypothesis fits a pose
from 6 correspondences with a DLT + orthogonalization, which is exact for
noise-free samples and robust under RANSAC scoring), inliers are counted for
every hypothesis against every correspondence in one [H, N] pass, and the best
hypothesis is polished with fixed-iteration Gauss-Newton on its inliers.
Everything is static-shape: masks thread validity, `lax` loops are unrolled by
XLA, and hundreds of frames solve per device step when vmapped over the batch.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rotations import angle_axis_to_matrix

_EPS = 1e-9


class PnPResult(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3] world->cam rotation
    t: jnp.ndarray  # [..., 3]
    inliers: jnp.ndarray  # [..., N] bool
    num_inliers: jnp.ndarray  # [...] int32
    ok: jnp.ndarray  # [...] bool — solution valid


def _det3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 determinant (avoids the batched LU lowering)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse via the adjugate (pure VPU arithmetic)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _orthogonalize(M: jnp.ndarray) -> jnp.ndarray:
    """Project a 3x3 matrix onto SO(3) via Newton polar iteration (batched).

    X <- (X + X^-T) / 2 converges quadratically to the orthogonal polar
    factor — far cheaper on TPU than a batched 3x3 SVD (which lowers to a
    slow QR-iteration loop). Closed-form adjugate inverses keep the whole
    iteration on the VPU. The determinant sign is fixed up front so the
    iteration lands in SO(3), not O(3).
    """
    det = _det3(M)
    sign = jnp.sign(jnp.where(det == 0, 1.0, det))
    X = M * sign[..., None, None]
    # normalize scale for convergence, then 4 Newton steps
    norm = jnp.sqrt(jnp.sum(X * X, axis=(-2, -1), keepdims=True) / 3.0)
    X = X / (norm + _EPS)
    for _ in range(4):
        X = 0.5 * (X + jnp.swapaxes(_inv3(X), -1, -2))
    return X


def _smallest_eigvec(AtA: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Smallest eigenvector of a symmetric PSD [D, D] by inverse iteration.

    Fully unrolled scalar Cholesky + triangular solves: under the RANSAC
    [B, H] double-vmap every scalar here becomes one fused VPU op over all
    hypotheses. The previous ``cho_factor``/``cho_solve`` version lowered to
    a batched LAPACK-style custom-call that alone cost ~30 ms/step at
    48x512 hypotheses on v5e; this form costs <2 ms. D is static (12 for the
    DLT), so the D^3/6 multiply-adds unroll at trace time.
    """
    d = AtA.shape[-1]
    shift = 1e-6 * (jnp.trace(AtA) / d) + 1e-12

    # Cholesky A = L L^T, scalars unrolled (lower triangle only)
    L = [[None] * d for _ in range(d)]
    inv_diag = [None] * d
    for j in range(d):
        s = AtA[j, j] + shift
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        diag = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = diag
        inv_diag[j] = 1.0 / diag
        for i in range(j + 1, d):
            s = AtA[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag[j]

    def solve(v):
        # L y = v (forward), L^T x = y (backward)
        y = [None] * d
        for i in range(d):
            s = v[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s * inv_diag[i]
        x = [None] * d
        for i in reversed(range(d)):
            s = y[i]
            for k in range(i + 1, d):
                s = s - L[k][i] * x[k]
            x[i] = s * inv_diag[i]
        return x

    v = [jnp.asarray(1.0 / (d**0.5), AtA.dtype)] * d
    for _ in range(iters):
        v = solve(v)
        norm = jnp.sqrt(sum(c * c for c in v)) + _EPS
        v = [c / norm for c in v]
    return jnp.stack(v)


def _fit_pose_dlt(pts3d: jnp.ndarray, pts2dn: jnp.ndarray) -> tuple:
    """Fit [R|t] from >=6 2D-3D correspondences by DLT on normalized coords.

    Args:
        pts3d: [S, 3] world points; pts2dn: [S, 2] normalized image coords.
    Returns:
        (R [3,3], t [3]).
    """
    s = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((s, 1), pts3d.dtype)], axis=-1)  # [S,4]
    zeros = jnp.zeros_like(X)
    u = pts2dn[:, 0:1]
    v = pts2dn[:, 1:2]
    # Rows: [X 0 -u*X ; 0 X -v*X] for P = [R|t] (3x4), x ~ P X.
    r0 = jnp.concatenate([X, zeros, -u * X], axis=-1)  # [S, 12]
    r1 = jnp.concatenate([zeros, X, -v * X], axis=-1)
    A = jnp.concatenate([r0, r1], axis=0)  # [2S, 12]
    AtA = A.T @ A
    p = _smallest_eigvec(AtA).reshape(3, 4)
    # Fix scale & sign: rows of R must be unit; depth of points positive.
    scale = jnp.cbrt(jnp.abs(_det3(p[:, :3])) + _EPS)
    p = p / (scale + _EPS)
    depth = pts3d @ p[2, :3] + p[2, 3]
    sign = jnp.where(jnp.sum(jnp.sign(depth)) >= 0, 1.0, -1.0)
    p = p * sign
    R = _orthogonalize(p[:, :3])
    t = p[:, 3]
    return R, t


def _fit_pose_planar(pts3d: jnp.ndarray, pts2dn: jnp.ndarray) -> tuple:
    """Fit two [R|t] candidates assuming the sample is (near-)coplanar.

    The 12-dim DLT in :func:`_fit_pose_dlt` is DEGENERATE for coplanar 3D
    points: only the plane->image homography (8 DOF) is constrained, so the
    null space is multi-dimensional and the recovered P is arbitrary. Real
    OnePose objects can be near-planar (low-texture boxes) and the reference
    backends (pycolmap P3P / OpenCV EPnP planar branch,
    ``src/utils/metric_utils.py:121-204``) handle this case natively. Here:
    build an orthonormal plane frame from the sample, fit the homography by
    DLT in that frame, and decompose H -> [R|t] (Zhang/IPPE-style). The two
    sign decompositions are both returned; RANSAC inlier counting and the
    cheirality test in :func:`_reproj_errors` pick the right one.

    Returns:
        (R [2,3,3], t [2,3]) — the two candidate poses.
    """
    s = pts3d.shape[0]
    c = jnp.mean(pts3d, axis=0)
    M = pts3d - c  # [S, 3]
    C = M.T @ M  # 3x3 scatter
    # plane normal = smallest eigenvector (inverse iteration, reuses the
    # unrolled Cholesky solver)
    nrm = _smallest_eigvec(C)
    nrm = nrm / (jnp.linalg.norm(nrm) + _EPS)
    # in-plane basis: project the least-aligned axis onto the plane
    trial = jnp.eye(3, dtype=pts3d.dtype)
    align = jnp.abs(trial @ nrm)
    e1 = trial[jnp.argmin(align)]
    e1 = e1 - jnp.dot(e1, nrm) * nrm
    e1 = e1 / (jnp.linalg.norm(e1) + _EPS)
    e2 = jnp.cross(nrm, e1)

    p = jnp.stack([M @ e1, M @ e2], axis=-1)  # [S, 2] plane coords
    scale = jnp.sqrt(jnp.mean(jnp.sum(p * p, axis=-1)) + _EPS)
    p = p / scale

    ones = jnp.ones((s, 1), pts3d.dtype)
    zeros3 = jnp.zeros((s, 3), pts3d.dtype)
    P1 = jnp.concatenate([p, ones], axis=-1)  # [S, 3]
    u = pts2dn[:, 0:1]
    v = pts2dn[:, 1:2]
    r0 = jnp.concatenate([P1, zeros3, -u * P1], axis=-1)  # [S, 9]
    r1 = jnp.concatenate([zeros3, P1, -v * P1], axis=-1)
    A = jnp.concatenate([r0, r1], axis=0)
    H = _smallest_eigvec(A.T @ A).reshape(3, 3)  # plane' -> normalized img
    # undo the plane-coordinate scaling (columns 0, 1 act on p/scale)
    H = H.at[:, :2].multiply(1.0 / scale)

    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 2.0 / (jnp.linalg.norm(h1) + jnp.linalg.norm(h2) + _EPS)
    a1, a2, a3 = lam * h1, lam * h2, lam * h3

    def decomp(s1, s2, s3):
        r1_ = s1 / (jnp.linalg.norm(s1) + _EPS)
        r2_ = s2 - jnp.dot(r1_, s2) * r1_
        r2_ = r2_ / (jnp.linalg.norm(r2_) + _EPS)
        r3_ = jnp.cross(r1_, r2_)
        Q = jnp.stack([r1_, r2_, r3_], axis=1)  # R @ [e1 e2 n] = Q
        B = jnp.stack([e1, e2, nrm], axis=1)  # world-plane basis
        R = Q @ B.T
        t = s3 - R @ c
        return R, t

    Rp, tp = decomp(a1, a2, a3)
    Rm, tm = decomp(-a1, -a2, -a3)
    return jnp.stack([Rp, Rm]), jnp.stack([tp, tm])


def _solve_quartic(c: jnp.ndarray) -> jnp.ndarray:
    """All four roots of ``c[0] x^4 + ... + c[4] = 0`` (Ferrari, closed form).

    Fully vectorizable/TPU-compatible: no ``eigvals`` (nonsymmetric eig is
    unimplemented on the TPU backend) and no data-dependent branching. Works
    in complex arithmetic throughout and polishes each root with two Newton
    steps (complex64 Ferrari alone loses ~3 digits, which matters at RANSAC's
    tight normalized-coordinate thresholds).

    Returns:
        [4] complex roots (callers filter by |imag| and domain constraints).
    """
    ctype = jnp.complex64 if c.dtype == jnp.float32 else jnp.complex128
    c = c.astype(ctype)
    lead = jnp.where(jnp.abs(c[0]) < _EPS, jnp.asarray(_EPS, ctype), c[0])
    a, b, cc, d = c[1] / lead, c[2] / lead, c[3] / lead, c[4] / lead
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a/4
    p = b - 3 * a * a / 8
    q = cc - a * b / 2 + a * a * a / 8
    r = d - a * cc / 4 + a * a * b / 16 - 3 * a**4 / 256
    # resolvent cubic 8 m^3 + 8 p m^2 + (2 p^2 - 8 r) m - q^2 = 0
    c3, c2, c1, c0 = (
        jnp.asarray(8.0, ctype),
        8 * p,
        2 * p * p - 8 * r,
        -q * q,
    )
    # Cardano on the monic depressed cubic u^3 + P u + Q
    A2, A1, A0 = c2 / c3, c1 / c3, c0 / c3
    P = A1 - A2 * A2 / 3
    Q = 2 * A2**3 / 27 - A2 * A1 / 3 + A0
    disc = jnp.sqrt(Q * Q / 4 + P**3 / 27)
    # complex cube root via exp(log/3); guard log(0)
    def _cbrt(z):
        z = jnp.where(jnp.abs(z) < 1e-30, jnp.asarray(1e-30, ctype), z)
        return jnp.exp(jnp.log(z) / 3)

    u1 = _cbrt(-Q / 2 + disc)
    # all three cube roots; pick m with the largest |2m| for a stable sqrt
    w = jnp.asarray(-0.5 + 0.8660254037844386j, ctype)
    us = jnp.stack([u1, u1 * w, u1 * w * w])
    # guard u=0 (triple root): P/(3u) blows up
    us = jnp.where(jnp.abs(us) < 1e-30, jnp.asarray(1e-30, ctype), us)
    ms = us - P / (3 * us) - A2 / 3
    m = ms[jnp.argmax(jnp.abs(ms))]
    s = jnp.sqrt(2 * m)
    s = jnp.where(jnp.abs(s) < _EPS, jnp.asarray(_EPS, ctype), s)
    # quartic factors: y^2 +- s y + (p/2 + m -+ q/(2s))
    t0 = p / 2 + m
    d1 = jnp.sqrt(s * s / 4 - (t0 - q / (2 * s)))
    d2 = jnp.sqrt(s * s / 4 - (t0 + q / (2 * s)))
    roots = jnp.stack(
        [-s / 2 + d1, -s / 2 - d1, s / 2 + d2, s / 2 - d2]
    ) - a / 4
    # Newton polish against the original (normalized) quartic
    for _ in range(2):
        f = (((roots + a) * roots + b) * roots + cc) * roots + d
        df = ((4 * roots + 3 * a) * roots + 2 * b) * roots + cc
        df = jnp.where(jnp.abs(df) < _EPS, jnp.asarray(_EPS, ctype), df)
        roots = roots - f / df
    return roots


def _triad(pts: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal frame [e1 e2 e3] (columns) spanned by 3 points.

    e1 along P2-P1, e2 the orthogonalized P3-P1 direction, e3 their cross
    product. Pure VPU arithmetic — no decompositions.
    """
    d1 = pts[1] - pts[0]
    e1 = d1 / (jnp.linalg.norm(d1) + _EPS)
    d2 = pts[2] - pts[0]
    d2 = d2 - jnp.dot(e1, d2) * e1
    e2 = d2 / (jnp.linalg.norm(d2) + _EPS)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=1)


def _align_three(src: jnp.ndarray, dst: jnp.ndarray) -> tuple:
    """Rigid transform R, t with ``R @ src + t == dst`` for a 3-point set.

    Closed-form orthonormal-triad construction: R = triad(dst) @ triad(src)^T.
    Exact when the two triangles are congruent — which P3P guarantees, since
    the camera-frame points are built from distances solving the
    law-of-cosines system, so side lengths match the world triangle to solver
    precision. Replaces an SVD Kabsch fit: at RANSAC scale (~98k 3x3 SVDs per
    batch-48 step) the batched TPU SVD lowering alone cost ~1.5 s/step; this
    form is a handful of fused VPU ops (round-3 verdict item #1).
    """
    R = _triad(dst) @ _triad(src).T
    t = jnp.mean(dst, axis=0) - R @ jnp.mean(src, axis=0)
    return R, t


def _fit_pose_p3p(pts3d: jnp.ndarray, pts2dn: jnp.ndarray) -> tuple:
    """Minimal 3-point pose: Grunert's P3P, all four solutions.

    The production minimal solver the reference gets from its native backends
    (pycolmap P3P / ``cv2.solvePnPRansac``, ``src/utils/metric_utils.py:
    121-204``). Three-point samples keep RANSAC effective when few
    correspondences survive the confidence threshold: with N matches and one
    outlier, a 6-point DLT sample is contaminated with probability ~6/N while
    a 3-point sample escapes with probability ~(1-3/N) — decisive for N<20.

    Derivation (Grunert 1841 via Haralick et al. 1994): with distances
    s1,s2,s3 from the camera to the three points, the law of cosines in the
    three view triangles reduces (u=s2/s1, v=s3/s1) to a quartic in v and a
    rational expression for u. All four roots are returned as pose
    candidates; RANSAC inlier counting arbitrates (no 4th-point test needed).

    Args:
        pts3d: [3, 3] world points; pts2dn: [3, 2] normalized image coords.
    Returns:
        (R [4,3,3], t [4,3]) — non-physical roots yield NaN poses, which the
        RANSAC scorer already discards via its finite-ness guard.
    """
    f = jnp.concatenate(
        [pts2dn, jnp.ones((3, 1), pts2dn.dtype)], axis=-1
    )
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # unit bearings
    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    a2 = jnp.sum((P2 - P3) ** 2)  # side a opposite P1
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    b2 = jnp.maximum(b2, _EPS)
    cos_al = jnp.dot(f[1], f[2])  # angle at camera between rays 2,3
    cos_be = jnp.dot(f[0], f[2])
    cos_ga = jnp.dot(f[0], f[1])
    A = a2 / b2
    B = c2 / b2
    # u = N(v)/D(v): N deg-2, D deg-1 (ascending coeffs)
    N = jnp.stack([A - B + 1, -2 * (A - B) * cos_be, A - B - 1])
    D = jnp.stack([2 * cos_ga, -2 * cos_al])
    # quartic: Q(v) D^2 + N^2 - 2 cos_ga N D = 0,
    # Q = 1 - B(1 + v^2 - 2 v cos_be)
    Q = jnp.stack([1 - B, 2 * B * cos_be, -B])

    def pmul(x, y):  # static-size ascending-coeff product
        n_out = x.shape[0] + y.shape[0] - 1
        out = jnp.zeros(n_out, x.dtype)
        for i in range(x.shape[0]):
            for j in range(y.shape[0]):
                out = out.at[i + j].add(x[i] * y[j])
        return out

    D2 = pmul(D, D)
    # assemble degree-4 ascending coefficients
    qd2 = pmul(Q, D2)  # deg 4
    nn = pmul(N, N)  # deg 4
    nd = pmul(N, D)  # deg 3
    coeffs_asc = qd2 + nn
    coeffs_asc = coeffs_asc.at[:4].add(-2 * cos_ga * nd)
    roots = _solve_quartic(coeffs_asc[::-1])  # solver wants descending

    vr = jnp.real(roots)
    ok = (jnp.abs(jnp.imag(roots)) < 1e-4 * (1 + jnp.abs(vr))) & (vr > _EPS)
    vr = jnp.where(ok, vr, jnp.nan)

    # u(v), then absolute distances from s1^2 (1 + v^2 - 2 v cos_be) = b^2
    Nv = (N[2] * vr + N[1]) * vr + N[0]
    Dv = D[1] * vr + D[0]
    Dv = jnp.where(jnp.abs(Dv) < _EPS, jnp.nan, Dv)
    ur = Nv / Dv
    # Newton polish of (u, v) on the original law-of-cosines pair — the
    # quartic path runs in complex64 and loses ~3 digits, which is ~0.5 deg
    # of hypothesis rotation; two 2x2 Newton steps restore f32 precision
    for _ in range(2):
        g1 = ur * ur + vr * vr - 2 * ur * vr * cos_al - A * (
            1 + vr * vr - 2 * vr * cos_be
        )
        g2 = 1 + ur * ur - 2 * ur * cos_ga - B * (
            1 + vr * vr - 2 * vr * cos_be
        )
        j11 = 2 * ur - 2 * vr * cos_al
        j12 = 2 * vr - 2 * ur * cos_al - A * (2 * vr - 2 * cos_be)
        j21 = 2 * ur - 2 * cos_ga
        j22 = -B * (2 * vr - 2 * cos_be)
        det = j11 * j22 - j12 * j21
        det = jnp.where(jnp.abs(det) < _EPS, jnp.nan, det)
        ur = ur - (g1 * j22 - g2 * j12) / det
        vr = vr - (g2 * j11 - g1 * j21) / det
    s1 = jnp.sqrt(b2 / jnp.maximum(1 + vr * vr - 2 * vr * cos_be, _EPS))
    s1 = jnp.where((ur > _EPS), s1, jnp.nan)
    cam = (
        jnp.stack([s1, ur * s1, vr * s1], axis=-1)[..., None]
        * f[None, :, :]
    )  # [4, 3(pts), 3(xyz)]
    R, t = jax.vmap(lambda pc: _align_three(pts3d, pc))(cam)
    return R, t


def _reproj_errors(
    R: jnp.ndarray, t: jnp.ndarray, pts3d: jnp.ndarray, pts2dn: jnp.ndarray
) -> jnp.ndarray:
    """Squared reprojection error in normalized coords: [..., N]."""
    pc = pts3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    uv = pc[..., :2] / jnp.where(
        jnp.abs(pc[..., 2:3]) < _EPS, _EPS, pc[..., 2:3]
    )
    err = jnp.sum((uv - pts2dn) ** 2, axis=-1)
    # behind-camera observations can never be inliers
    return jnp.where(pc[..., 2] > _EPS, err, jnp.inf)


def _gauss_newton_refine(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    pts3d: jnp.ndarray,
    pts2dn: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
):
    """Fixed-iteration damped GN on se(3) (aa increment) minimizing weighted
    reprojection error in normalized coordinates."""

    def residual(params, R_base):
        aa, t = params[:3], params[3:]
        R = angle_axis_to_matrix(aa) @ R_base
        pc = pts3d @ R.T + t
        z = jnp.where(jnp.abs(pc[..., 2:3]) < _EPS, _EPS, pc[..., 2:3])
        uv = pc[..., :2] / z
        r = (uv - pts2dn) * weights[:, None]
        return r.reshape(-1)

    def body(_, carry):
        R_base, t = carry
        params = jnp.concatenate([jnp.zeros(3, R_base.dtype), t])
        J = jax.jacfwd(residual)(params, R_base)  # [2N, 6]
        r = residual(params, R_base)
        JtJ = J.T @ J + 1e-6 * jnp.eye(6, dtype=J.dtype)
        g = J.T @ r
        delta = -jnp.linalg.solve(JtJ, g)
        new_R = angle_axis_to_matrix(delta[:3]) @ R_base
        new_t = t + delta[3:]
        # keep update only if residual decreased (cheap trust region)
        new_params = jnp.concatenate([jnp.zeros(3, R_base.dtype), new_t])
        improved = jnp.sum(residual(new_params, new_R) ** 2) <= jnp.sum(r**2)
        R_out = jnp.where(improved, new_R, R_base)
        t_out = jnp.where(improved, new_t, t)
        return R_out, t_out

    R, t = jax.lax.fori_loop(0, iters, body, (R0, t0))
    return R, t


@partial(
    jax.jit,
    static_argnames=(
        "num_hypotheses",
        "sample_size",
        "refine_iters",
        "planar_hypotheses",
        "p3p_hypotheses",
        "p3p_samples",
        "prescore_subset",
        "rescore_top",
    ),
)
def ransac_pnp(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    reproj_threshold_px: float = 3.3,
    num_hypotheses: int = 512,
    sample_size: int = 6,
    refine_iters: int = 10,
    planar_hypotheses: bool = True,
    p3p_hypotheses: bool = True,
    p3p_samples: int = 128,
    min_inliers: int = 4,
    prescore_subset: int = 128,
    rescore_top: int = 64,
) -> PnPResult:
    """RANSAC PnP for one frame with fixed-capacity correspondences.

    Mirrors reference ``ransac_PnP`` (``metric_utils.py:121-204``) semantics:
    pixel-space reprojection threshold, best-hypothesis-by-inlier-count, final
    nonlinear refinement on inliers. vmap over frames for batch solving.

    Args:
        pts3d: [N, 3] object points (world frame).
        pts2d: [N, 2] pixel observations.
        K: [3, 3] intrinsics.
        valid: [N] bool mask of real (non-padded) correspondences.
        rng: PRNG key for hypothesis sampling.
        reproj_threshold_px: inlier threshold in pixels.
        prescore_subset: when >0 and < N, rank ALL hypotheses by inlier
            count on this many randomly-chosen valid correspondences, then
            exact-rescore only the ``rescore_top`` best on the full set.
            With all hypothesis families on (1 DLT + 2 planar + 4 P3P per
            sample = 7*H candidates) the full [7H, N] scoring pass is the
            PnP stage's dominant HBM traffic; the subsample cut reduces it
            ~10x at N=1428 with no measurable accuracy change (the true
            best hypothesis' inlier fraction separates it from junk by far
            more than the Bernoulli noise of a 128-point subsample, and the
            final winner among survivors is still chosen by full-set
            count). Set 0 to score every hypothesis on every point.
    Returns:
        PnPResult with world->cam (R, t).
    """
    n = pts3d.shape[0]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pts2dn = jnp.stack(
        [(pts2d[:, 0] - cx) / fx, (pts2d[:, 1] - cy) / fy], axis=-1
    )
    # normalized-coords threshold (use mean focal for anisotropic K)
    f_mean = 0.5 * (fx + fy)
    thr2 = (reproj_threshold_px / f_mean) ** 2

    # --- hypothesis sampling: weighted-by-validity without dynamic shapes.
    # Gumbel-top-k over valid slots gives distinct samples per hypothesis.
    g = jax.random.gumbel(rng, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    # gumbel top-k by S rounds of argmax+mask: lax.top_k lowers to a full
    # [H, N] sort (~2 ms/step at 48x512x512 on v5e); S masked-argmax passes
    # select the identical sample set
    idxs = []
    lanes = jnp.arange(n)[None, :]
    for _ in range(sample_size):
        i = jnp.argmax(scores, axis=-1)  # [H]
        idxs.append(i)
        scores = jnp.where(lanes == i[:, None], -jnp.inf, scores)
    sample_idx = jnp.stack(idxs, axis=-1)  # [H, S]

    samp3d = pts3d[sample_idx]  # [H, S, 3]
    samp2dn = pts2dn[sample_idx]  # [H, S, 2]

    fit = jax.vmap(_fit_pose_dlt)
    Rh, th = fit(samp3d, samp2dn)  # [H, 3, 3], [H, 3]
    if planar_hypotheses:
        # coplanar samples make the 12-dim DLT degenerate — add the two
        # homography-decomposition candidates per sample and let inlier
        # counting arbitrate (3H candidates total)
        Rpl, tpl = jax.vmap(_fit_pose_planar)(samp3d, samp2dn)  # [H,2,3,3]
        Rh = jnp.concatenate([Rh, Rpl.reshape(-1, 3, 3)], axis=0)
        th = jnp.concatenate([th, tpl.reshape(-1, 3)], axis=0)
    if p3p_hypotheses:
        # minimal 3-point hypotheses (first 3 slots of each sample — gumbel
        # top-k order is a uniform random permutation of the valid set, so
        # this is a uniform 3-subset). Indispensable when few matches survive
        # the confidence threshold: a 6-point sample needs ALL 6 clean, a
        # 3-point sample stays clean with prob (1-o)(1-o')(1-o'') — at
        # n=6, 1 outlier that is 1/2 vs 0 clean 6-samples.
        # P3P is the heaviest per-sample fit (Ferrari quartic + Newton polish
        # + 4 triad alignments) and yields 4 candidates/sample, so it gets
        # its OWN (smaller) sample budget: at 40% outliers a clean triad
        # draws with prob 0.6^3=0.22, so 128 triads miss with prob
        # (1-0.22)^128 ~ 1e-14 — 512 were pure overhead (round-4 PnP stage:
        # 36.5 ms/step at batch 48, VERDICT item 3).
        h3 = min(p3p_samples, num_hypotheses) if p3p_samples else num_hypotheses
        Rp3, tp3 = jax.vmap(_fit_pose_p3p)(
            samp3d[:h3, :3], samp2dn[:h3, :3]
        )  # [h3, 4, 3, 3]
        Rh = jnp.concatenate([Rh, Rp3.reshape(-1, 3, 3)], axis=0)
        th = jnp.concatenate([th, tp3.reshape(-1, 3)], axis=0)

    # guard NaN poses
    finite = jnp.all(jnp.isfinite(Rh), axis=(-2, -1)) & jnp.all(
        jnp.isfinite(th), axis=-1
    )
    if prescore_subset and prescore_subset < n:
        # stage 1: rank every candidate on a random valid subsample
        gs = jnp.where(valid, jax.random.gumbel(jax.random.fold_in(rng, 1), (n,)), -jnp.inf)
        _, sub_idx = jax.lax.top_k(gs, prescore_subset)
        sub_valid = valid[sub_idx]
        errs_sub = _reproj_errors(
            Rh, th, pts3d[sub_idx][None], pts2dn[sub_idx][None]
        )  # [7H, S_sub]
        cnt_sub = jnp.sum((errs_sub <= thr2) & sub_valid[None, :], axis=-1)
        cnt_sub = jnp.where(finite, cnt_sub, -1)
        keep = min(rescore_top, Rh.shape[0])
        _, top_idx = jax.lax.top_k(cnt_sub, keep)
        Rh, th = Rh[top_idx], th[top_idx]
        finite = finite[top_idx]

    # stage 2 (or only stage): exact scoring of the surviving candidates
    errs = _reproj_errors(Rh, th, pts3d[None], pts2dn[None])  # [H', N]
    inl = (errs <= thr2) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)

    R_best, t_best = Rh[best], th[best]
    inl_best = inl[best]
    w = inl_best.astype(pts3d.dtype)
    R_ref, t_ref = _gauss_newton_refine(
        R_best, t_best, pts3d, pts2dn, w, iters=refine_iters
    )
    # recount inliers after refinement
    errs_ref = _reproj_errors(R_ref, t_ref, pts3d, pts2dn)
    inl_ref = (errs_ref <= thr2) & valid
    num = jnp.sum(inl_ref).astype(jnp.int32)
    # min_inliers (not sample_size) gates acceptance: a pose supported by 4-5
    # inliers is well-determined even though the DLT samples draw 6 — the
    # reference accepts any cv2.solvePnPRansac success (4-point minimum)
    ok = (num >= min_inliers) & jnp.all(jnp.isfinite(R_ref)) & jnp.all(
        jnp.isfinite(t_ref)
    )
    identity = jnp.eye(3, dtype=pts3d.dtype)
    R_out = jnp.where(ok, R_ref, identity)
    t_out = jnp.where(ok, t_ref, jnp.zeros(3, pts3d.dtype))
    return PnPResult(R=R_out, t=t_out, inliers=inl_ref, num_inliers=num, ok=ok)


def ransac_pnp_batch(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    reproj_threshold_px: float = 3.3,
    num_hypotheses: int = 512,
    planar_hypotheses: bool = True,
    p3p_hypotheses: bool = True,
    p3p_samples: int = 128,
    prescore_subset: int = 128,
    rescore_top: int = 64,
) -> PnPResult:
    """vmapped RANSAC PnP over a frame batch: [B, N, ...] -> batched PnPResult."""
    keys = jax.random.split(rng, pts3d.shape[0])
    return jax.vmap(
        lambda p3, p2, k, v, key: ransac_pnp(
            p3,
            p2,
            k,
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
    )(pts3d, pts2d, K, valid, keys)
