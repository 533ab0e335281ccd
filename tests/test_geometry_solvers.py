"""Synthetic-geometry tests for the COLMAP/DeepLM/pycolmap replacements:
epipolar verification, DLT triangulation, RANSAC-PnP, LM solvers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_scenes import make_scene, project_np
from onepose_plus_plus_tpu.geometry import (
    angle_axis_to_matrix,
    depth_residual_track,
    epipolar_error,
    first_order_solve,
    fundamental_from_poses,
    lm_solve,
    lm_solve_scalar,
    matrix_to_angle_axis,
    ransac_pnp,
    ransac_pnp_batch,
    triangulate_and_filter,
    triangulate_two_view,
    verify_matches,
)


class TestEpipolar:
    def test_fundamental_annihilates_true_matches(self):
        rng = np.random.default_rng(0)
        K, pts, Ts = make_scene(rng)
        uv0, _ = project_np(K, Ts[0], pts)
        uv1, _ = project_np(K, Ts[1], pts)
        F = fundamental_from_poses(
            jnp.asarray(K), jnp.asarray(K), jnp.asarray(Ts[0]), jnp.asarray(Ts[1])
        )
        err = epipolar_error(F, jnp.asarray(uv0), jnp.asarray(uv1))
        assert float(jnp.max(err)) < 1e-3

    def test_verify_matches_rejects_outliers(self):
        rng = np.random.default_rng(1)
        K, pts, Ts = make_scene(rng)
        uv0, _ = project_np(K, Ts[0], pts)
        uv1, _ = project_np(K, Ts[1], pts)
        uv1_bad = uv1.copy()
        uv1_bad[::4] += rng.uniform(30, 60, (len(uv1[::4]), 2))
        valid = np.ones(len(pts), bool)
        inl = verify_matches(
            jnp.asarray(K)[None],
            jnp.asarray(K)[None],
            jnp.asarray(Ts[0])[None],
            jnp.asarray(Ts[1])[None],
            jnp.asarray(uv0)[None],
            jnp.asarray(uv1_bad)[None],
            jnp.asarray(valid)[None],
            max_error_px=4.0,
        )[0]
        inl = np.asarray(inl)
        assert inl[1::4].all() or inl[1:].reshape(-1)[~np.arange(len(pts) - 1) % 4 == 0].any()
        # every corrupted index rejected, clean ones kept
        assert not inl[::4].any()
        clean = np.ones(len(pts), bool)
        clean[::4] = False
        assert inl[clean].mean() > 0.99


class TestTriangulation:
    def test_two_view_recovers_points(self):
        rng = np.random.default_rng(2)
        K, pts, Ts = make_scene(rng)
        uv0, _ = project_np(K, Ts[0], pts)
        uv1, _ = project_np(K, Ts[1], pts)
        xyz = triangulate_two_view(
            jnp.asarray(K)[None],
            jnp.asarray(K)[None],
            jnp.asarray(Ts[0])[None],
            jnp.asarray(Ts[1])[None],
            jnp.asarray(uv0)[None],
            jnp.asarray(uv1)[None],
        )[0]
        assert np.abs(np.asarray(xyz) - pts).max() < 1e-3

    def test_multiview_tracks_with_padding_and_noise(self):
        rng = np.random.default_rng(3)
        n_views, n_pts, vcap = 6, 48, 8
        K, pts, Ts = make_scene(rng, n_views=n_views, n_pts=n_pts)
        uv = np.zeros((n_pts, vcap, 2))
        Karr = np.tile(K, (n_pts, vcap, 1, 1))
        Tarr = np.tile(np.eye(4), (n_pts, vcap, 1, 1))
        valid = np.zeros((n_pts, vcap), bool)
        for t in range(n_pts):
            views = rng.choice(n_views, size=rng.integers(3, n_views + 1), replace=False)
            for s, v in enumerate(views):
                puv, _ = project_np(K, Ts[v], pts[t : t + 1])
                uv[t, s] = puv[0] + rng.normal(0, 0.3, 2)
                Tarr[t, s] = Ts[v]
                valid[t, s] = True
        xyz, obs_inl, track_ok, reproj = triangulate_and_filter(
            jnp.asarray(Karr), jnp.asarray(Tarr), jnp.asarray(uv), jnp.asarray(valid)
        )
        ok = np.asarray(track_ok)
        assert ok.mean() > 0.95
        err = np.linalg.norm(np.asarray(xyz)[ok] - pts[ok], axis=-1)
        assert np.median(err) < 5e-3

    def test_outlier_observation_flagged(self):
        rng = np.random.default_rng(4)
        K, pts, Ts = make_scene(rng, n_views=5, n_pts=8)
        vcap = 5
        uv = np.zeros((8, vcap, 2))
        Karr = np.tile(K, (8, vcap, 1, 1))
        Tarr = np.tile(Ts[None, :, :, :], (8, 1, 1, 1))
        valid = np.ones((8, vcap), bool)
        for t in range(8):
            for v in range(vcap):
                puv, _ = project_np(K, Ts[v], pts[t : t + 1])
                uv[t, v] = puv[0]
        uv[:, 2] += 50.0  # corrupt view 2 everywhere
        xyz, obs_inl, track_ok, _ = triangulate_and_filter(
            jnp.asarray(Karr), jnp.asarray(Tarr), jnp.asarray(uv), jnp.asarray(valid)
        )
        obs_inl = np.asarray(obs_inl)
        assert np.asarray(track_ok).all()
        assert not obs_inl[:, 2].any()
        assert obs_inl[:, [0, 1, 3, 4]].mean() > 0.95


class TestPnP:
    def _solve(self, outlier_frac, seed=0, n=128):
        rng = np.random.default_rng(seed)
        K, pts, Ts = make_scene(rng, n_views=1, n_pts=n)
        T = Ts[0]
        uv, _ = project_np(K, T, pts)
        uv += rng.normal(0, 0.3, uv.shape)
        n_out = int(outlier_frac * n)
        uv[:n_out] = rng.uniform(0, 512, (n_out, 2))
        res = ransac_pnp(
            jnp.asarray(pts),
            jnp.asarray(uv),
            jnp.asarray(K),
            jnp.ones(n, bool),
            jax.random.PRNGKey(seed),
            reproj_threshold_px=3.0,
            num_hypotheses=256,
        )
        return res, T, n_out

    @pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
    def test_recovers_pose(self, outlier_frac):
        res, T, n_out = self._solve(outlier_frac)
        assert bool(res.ok)
        R_err = np.asarray(res.R) @ T[:3, :3].T
        ang = np.rad2deg(
            np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        )
        assert ang < 0.5, f"rotation error {ang} deg"
        assert np.linalg.norm(np.asarray(res.t) - T[:3, 3]) < 0.02
        # outliers must not be counted as inliers
        assert not np.asarray(res.inliers)[: n_out // 2].any() or n_out == 0

    @pytest.mark.slow
    def test_batched(self):
        rng = np.random.default_rng(7)
        B, n = 4, 96
        K, pts, Ts = make_scene(rng, n_views=B, n_pts=n)
        uvs, valids = [], []
        for b in range(B):
            uv, _ = project_np(K, Ts[b], pts)
            uvs.append(uv)
            valids.append(np.ones(n, bool))
        res = ransac_pnp_batch(
            jnp.asarray(np.tile(pts, (B, 1, 1))),
            jnp.asarray(np.stack(uvs)),
            jnp.asarray(np.tile(K, (B, 1, 1))),
            jnp.asarray(np.stack(valids)),
            jax.random.PRNGKey(0),
            reproj_threshold_px=3.0,
            num_hypotheses=256,
        )
        assert np.asarray(res.ok).all()
        for b in range(B):
            assert np.abs(np.asarray(res.R[b]) - Ts[b][:3, :3]).max() < 5e-3

    def test_planar_point_cloud(self):
        """Coplanar 3D points (flat/low-texture objects; the overfit-e2e
        texture plane) make the 12-dim DLT degenerate — the homography
        hypotheses (_fit_pose_planar) must recover the pose. This pinned the
        round-2 all-zero metrics: every SfM point of the plane scene is on
        z=0 and the DLT-only RANSAC returned ~172deg rotations."""
        rng = np.random.default_rng(3)
        K, _, Ts = make_scene(rng, n_views=6, n_pts=8, img=128.0)
        pts = np.zeros((148, 3))
        pts[:, :2] = rng.uniform(-0.35, 0.35, (148, 2))
        for i in (0, 3, 5):
            T = Ts[i]
            uv, z = project_np(K, T, pts)
            uv += rng.normal(0, 0.5, uv.shape)
            vis = (z > 0.1) & (np.abs(uv - 64).max(axis=1) < 64)
            res = ransac_pnp(
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(uv, jnp.float32),
                jnp.asarray(K, jnp.float32),
                jnp.asarray(vis),
                jax.random.PRNGKey(i),
                reproj_threshold_px=3.3,
                num_hypotheses=128,
            )
            assert bool(res.ok)
            dR = np.asarray(res.R) @ T[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 2.0, f"view {i}: rotation error {ang} deg"
            assert np.linalg.norm(np.asarray(res.t) - T[:3, 3]) < 0.05
            assert int(res.num_inliers) > 0.8 * vis.sum()

    def test_quartic_solver_vs_numpy(self):
        from onepose_plus_plus_tpu.geometry.pnp import _solve_quartic

        rng = np.random.default_rng(11)
        for _ in range(25):
            c = rng.normal(0, 2, 5).astype(np.float32)
            c[0] = np.sign(c[0]) * max(abs(c[0]), 0.3)
            got = np.asarray(_solve_quartic(jnp.asarray(c)))
            want = np.roots(c.astype(np.float64))
            # nearest-match pairing (sort_complex mispairs conjugate twins
            # whose real parts differ by float noise)
            d = np.abs(got[:, None] - want[None, :]).min(axis=0)
            assert d.max() < 2e-3, (c, got, want)

    def test_p3p_exact_recovery(self):
        from onepose_plus_plus_tpu.geometry.pnp import _fit_pose_p3p

        rng = np.random.default_rng(5)
        hits = 0
        for trial in range(20):
            K, pts, Ts = make_scene(rng, n_views=1, n_pts=3)
            T = Ts[0]
            uv, z = project_np(K, T, pts)
            if (z <= 0.05).any():
                continue
            uvn = (uv - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
            R, t = _fit_pose_p3p(
                jnp.asarray(pts, jnp.float32), jnp.asarray(uvn, jnp.float32)
            )
            R, t = np.asarray(R), np.asarray(t)
            best = np.inf
            for c in range(4):
                if not np.isfinite(R[c]).all():
                    continue
                dR = R[c] @ T[:3, :3].T
                ang = np.rad2deg(
                    np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
                )
                err = ang + 100 * np.linalg.norm(t[c] - T[:3, 3])
                best = min(best, err)
            if best < 1.0:
                hits += 1
        # a P3P candidate must contain the true pose virtually always
        assert hits >= 17, hits

    def test_few_matches_with_outliers(self):
        """Round-3 regression: the trained toy matcher yields 5-8 confident
        matches of which 1-2 are wrong. Six-point DLT samples are then always
        contaminated and `num >= sample_size` rejects even perfect poses —
        the P3P minimal hypotheses + min_inliers gate must recover these."""
        rng = np.random.default_rng(21)
        cap = 256
        for n_valid, n_out in [(5, 1), (6, 1), (8, 2)]:
            K, pts, Ts = make_scene(rng, n_views=1, n_pts=n_valid)
            T = Ts[0]
            uv, _ = project_np(K, T, pts)
            uv[:n_out] += rng.uniform(30, 80, (n_out, 2))
            p3 = np.zeros((cap, 3), np.float32)
            p2 = np.zeros((cap, 2), np.float32)
            msk = np.zeros(cap, bool)
            p3[:n_valid], p2[:n_valid], msk[:n_valid] = pts, uv, True
            res = ransac_pnp(
                jnp.asarray(p3),
                jnp.asarray(p2),
                jnp.asarray(K, jnp.float32),
                jnp.asarray(msk),
                jax.random.PRNGKey(n_valid),
                reproj_threshold_px=3.3,
                num_hypotheses=128,
            )
            assert bool(res.ok), (n_valid, n_out, int(res.num_inliers))
            dR = np.asarray(res.R) @ T[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 2.0, (n_valid, ang)
            assert np.linalg.norm(np.asarray(res.t) - T[:3, 3]) < 0.05

    def test_hypothesis_family_toggles(self):
        """Every (planar, p3p) hypothesis-family combination must be
        explicitly passable through the public API — both the single-frame
        and batched entry points. Round-3 latent bug: p3p_hypotheses was
        missing from static_argnames, so any caller passing it explicitly
        crashed with TracerBoolConversionError and ransac_pnp_batch could
        never toggle it."""
        rng = np.random.default_rng(9)
        n = 64
        K, pts, Ts = make_scene(rng, n_views=2, n_pts=n)
        T = Ts[0]
        uv, _ = project_np(K, T, pts)
        uv += rng.normal(0, 0.3, uv.shape)
        for planar in (False, True):
            for p3p in (False, True):
                res = ransac_pnp(
                    jnp.asarray(pts),
                    jnp.asarray(uv),
                    jnp.asarray(K),
                    jnp.ones(n, bool),
                    jax.random.PRNGKey(0),
                    reproj_threshold_px=3.0,
                    num_hypotheses=64,
                    planar_hypotheses=planar,
                    p3p_hypotheses=p3p,
                )
                assert bool(res.ok), (planar, p3p)
                dR = np.asarray(res.R) @ T[:3, :3].T
                ang = np.rad2deg(
                    np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
                )
                assert ang < 1.0, (planar, p3p, ang)
        # batched entry point plumbs the toggles
        res_b = ransac_pnp_batch(
            jnp.asarray(pts)[None],
            jnp.asarray(uv)[None],
            jnp.asarray(K)[None],
            jnp.ones((1, n), bool),
            jax.random.PRNGKey(1),
            reproj_threshold_px=3.0,
            num_hypotheses=64,
            planar_hypotheses=False,
            p3p_hypotheses=True,
        )
        assert bool(np.asarray(res_b.ok)[0])

    def test_prescore_subset_matches_full_scoring(self):
        """Two-stage hypothesis scoring (subsample prescore -> exact rescore
        of the survivors, round-4 perf item): must recover the same pose as
        full [7H, N] scoring at high outlier fractions, and must stay correct
        when fewer valid correspondences exist than the subsample size
        (prescore then degenerates to scoring padded slots that the validity
        mask zeroes out)."""
        rng = np.random.default_rng(13)
        n = 512
        K, pts, Ts = make_scene(rng, n_views=1, n_pts=n)
        T = Ts[0]
        uv, _ = project_np(K, T, pts)
        uv += rng.normal(0, 0.3, uv.shape)
        uv[: int(0.4 * n)] = rng.uniform(0, 512, (int(0.4 * n), 2))
        for prescore in (0, 128):
            res = ransac_pnp(
                jnp.asarray(pts),
                jnp.asarray(uv),
                jnp.asarray(K),
                jnp.ones(n, bool),
                jax.random.PRNGKey(2),
                reproj_threshold_px=3.0,
                num_hypotheses=256,
                prescore_subset=prescore,
            )
            assert bool(res.ok), prescore
            dR = np.asarray(res.R) @ T[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 0.5, (prescore, ang)
            assert np.linalg.norm(np.asarray(res.t) - T[:3, 3]) < 0.02

        # capacity > subsample size but only 6 valid slots: top_k fills the
        # subsample with invalid indices, which sub_valid must neutralize
        cap, n_valid = 512, 6
        p3 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 2), np.float32)
        msk = np.zeros(cap, bool)
        Kv, pv, Tv = make_scene(np.random.default_rng(14), n_views=1, n_pts=n_valid)
        uvv, _ = project_np(Kv, Tv[0], pv)
        p3[:n_valid], p2[:n_valid], msk[:n_valid] = pv, uvv, True
        res = ransac_pnp(
            jnp.asarray(p3),
            jnp.asarray(p2),
            jnp.asarray(Kv, jnp.float32),
            jnp.asarray(msk),
            jax.random.PRNGKey(3),
            reproj_threshold_px=3.3,
            num_hypotheses=128,
            prescore_subset=128,
        )
        assert bool(res.ok)
        dR = np.asarray(res.R) @ Tv[0][:3, :3].T
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0, ang

    @pytest.mark.slow
    def test_degenerate_returns_not_ok(self):
        n = 16
        res = ransac_pnp(
            jnp.zeros((n, 3)),
            jnp.zeros((n, 2)),
            jnp.asarray(np.eye(3) * 500.0),
            jnp.zeros(n, bool),  # nothing valid
            jax.random.PRNGKey(0),
        )
        assert not bool(res.ok)
        assert np.allclose(np.asarray(res.R), np.eye(3))


class TestLM:
    def test_scalar_quadratic(self):
        # residual r = a*x - b has solution x = b/a
        a = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, (64,)))
        b = jnp.asarray(np.random.default_rng(1).uniform(-3, 3, (64,)))

        def res(x, ai, bi):
            return (ai * x - bi)[None]

        x0 = jnp.zeros(64)
        x, cost = lm_solve_scalar(res, x0, (a, b), max_iters=30)
        assert np.abs(np.asarray(x - b / a)).max() < 1e-4
        assert float(jnp.max(cost)) < 1e-8

    def test_multidim_rosenbrock_ls(self):
        # r = [10(y - x^2), 1 - x]; min at (1, 1)
        def res(p):
            return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

        x0 = jnp.tile(jnp.asarray([-1.2, 1.0]), (8, 1))
        x, cost = lm_solve(res, x0, (), max_iters=200)
        assert np.abs(np.asarray(x) - 1.0).max() < 1e-3

    def test_depth_residual_lm_recovers_depth(self):
        rng = np.random.default_rng(5)
        K, pts, Ts = make_scene(rng, n_views=4, n_pts=32)
        # track t observed in view 0 (keyframe) and views 1..3
        uv0_all, depth0 = project_np(K, Ts[0], pts)
        aa = np.stack([np.asarray(matrix_to_angle_axis(jnp.asarray(T[:3, :3]))) for T in Ts])
        uv1 = np.stack(
            [project_np(K, Ts[v], pts)[0] for v in range(1, 4)], axis=1
        )  # [N, 3, 2]

        def res(d, uv0, uv1_, p1aa, p1t):
            return depth_residual_track(
                d,
                uv0,
                uv1_,
                jnp.asarray(K),
                jnp.tile(jnp.asarray(K), (3, 1, 1)),
                jnp.asarray(aa[0]),
                jnp.asarray(Ts[0][:3, 3]),
                p1aa,
                p1t,
                jnp.ones(3, bool),
            )

        p1aa = jnp.asarray(np.tile(aa[1:4], (32, 1, 1)))
        p1t = jnp.asarray(np.tile(Ts[1:4, :3, 3], (32, 1, 1)))
        d0 = jnp.asarray(depth0 * rng.uniform(0.8, 1.2, 32))  # perturbed init
        d, cost = lm_solve_scalar(
            res,
            d0,
            (jnp.asarray(uv0_all), jnp.asarray(uv1), p1aa, p1t),
            max_iters=30,
        )
        assert np.abs(np.asarray(d) - depth0).max() < 1e-3

    def test_first_order_matches_lm(self):
        a = jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, (16,)))
        b = jnp.asarray(np.random.default_rng(1).uniform(-3, 3, (16,)))

        def res(x, ai, bi):
            return (ai * x - bi)[None]

        # reference fallback budget: 1000 Adam steps at lr 3e-2
        x, _ = first_order_solve(res, jnp.zeros(16), (a, b), max_iters=1000)
        assert np.abs(np.asarray(x - b / a)).max() < 1e-2


class TestP3PSampleBudget:
    def test_small_triad_budget_survives_outliers(self):
        """p3p_samples gives the P3P family its own (smaller) sample budget
        (round-4 perf: 512 triad solves were the heaviest PnP stage cost; at
        40% outliers 128 triads still hold a clean sample w.p. ~1-1e-14).
        The cut budget must still recover the pose in the low-match
        outlier-heavy regime P3P exists for, and p3p_samples=0 must keep the
        old all-samples behavior."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(21)
        n = 16  # few confident matches: the P3P regime
        K, pts, Ts = make_scene(rng, n_views=2, n_pts=n)
        T = Ts[0]
        uv, _ = project_np(K, T, pts)
        uv += rng.normal(0, 0.3, uv.shape)
        n_out = 6  # ~40% outliers
        uv[:n_out] += rng.uniform(30, 80, (n_out, 2))
        for p3p_samples in (32, 0):
            res = ransac_pnp(
                jnp.asarray(pts),
                jnp.asarray(uv),
                jnp.asarray(K),
                jnp.ones(n, bool),
                jax.random.PRNGKey(3),
                reproj_threshold_px=3.0,
                num_hypotheses=128,
                p3p_samples=p3p_samples,
            )
            assert bool(res.ok), p3p_samples
            dR = np.asarray(res.R) @ T[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 2.0, (p3p_samples, ang)
