"""Training-step tests: losses, supervision, and the sharded train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_plus_plus_tpu.config import (
    CoarseMatchingConfig,
    FineConfig,
    OnePosePlusConfig,
    TransformerConfig,
)
from onepose_plus_plus_tpu.train.losses import (
    LossConfig,
    coarse_focal_loss,
    fine_l2_std_loss,
    fine_supervision,
)


def test_coarse_focal_loss_matches_reference_math():
    """Masked-reduction focal loss == reference boolean-indexing focal loss."""
    rng = np.random.default_rng(0)
    n, l, s = 2, 16, 12
    conf = rng.random((n, l, s)).astype(np.float32) * 0.98 + 0.01
    gt_cell = rng.integers(-1, s, (n, l)).astype(np.int32)

    cfg = LossConfig()
    got = float(coarse_focal_loss(jnp.asarray(conf), jnp.asarray(gt_cell), cfg))

    # reference math (losses.py:28-56) with numpy boolean indexing
    conf_c = np.clip(conf, 1e-6, 1 - 1e-6)
    gt = np.zeros((n, l, s), bool)
    for b in range(n):
        for i in range(l):
            if gt_cell[b, i] >= 0:
                gt[b, i, gt_cell[b, i]] = True
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    loss_pos = -alpha * (1 - conf_c[gt]) ** gamma * np.log(conf_c[gt])
    loss_neg = -(1 - alpha) * conf_c[~gt] ** gamma * np.log(1 - conf_c[~gt])
    want = loss_pos.mean() + loss_neg.mean()
    assert got == pytest.approx(float(want), rel=1e-4)


def test_coarse_focal_loss_gradient_survives_saturation():
    """Round-2 0.0-accuracy root cause: with every GT confidence below the
    reference 1e-6 clamp, the clamped focal loss saturates at
    -alpha*log(1e-6) with EXACTLY zero positive gradient (training dead).
    The default log-space form must keep a healthy gradient there."""
    import dataclasses

    from onepose_plus_plus_tpu.ops.matching import dual_softmax_log_confidence

    rng = np.random.default_rng(3)
    n, l, s, c = 1, 24, 4096, 32
    # sharply peaked similarities at wrong cells -> GT conf ~ 1e-9 .. 1e-30
    f0 = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 4)
    f1 = jnp.asarray(rng.standard_normal((n, s, c)).astype(np.float32) * 4)
    gt_cell = jnp.asarray(rng.integers(0, s, (n, l)).astype(np.int32))
    cfg = LossConfig()

    def loss_fn(f0, log_space):
        conf, log_conf = dual_softmax_log_confidence(f0, f1, 0.08)
        return coarse_focal_loss(
            conf,
            gt_cell,
            dataclasses.replace(cfg, log_space=log_space),
            log_conf=log_conf if log_space else None,
        )

    conf, _ = dual_softmax_log_confidence(f0, f1, 0.08)
    gt_conf = np.take_along_axis(np.asarray(conf), np.asarray(gt_cell)[..., None], 2)
    assert gt_conf.max() < 1e-6, "setup must saturate the reference clamp"

    loss_clamped, g_clamped = jax.value_and_grad(lambda f: loss_fn(f, False))(f0)
    loss_log, g_log = jax.value_and_grad(lambda f: loss_fn(f, True))(f0)

    # clamped: loss pinned at -alpha*log(1e-6) + ~0, positive-gradient dead
    assert float(loss_clamped) == pytest.approx(
        -cfg.focal_alpha * np.log(1e-6), rel=1e-3
    )
    # log-space: larger loss (true -log conf >> 13.8), alive gradient
    assert float(loss_log) > float(loss_clamped)
    assert np.isfinite(np.asarray(g_log)).all()
    assert np.abs(np.asarray(g_log)).max() > 10 * np.abs(np.asarray(g_clamped)).max()

    # one gradient step on f0 must RAISE the GT-cell (log-)confidence
    _, log_old = dual_softmax_log_confidence(f0, f1, 0.08)
    _, log_new = dual_softmax_log_confidence(f0 - 1e-2 * g_log, f1, 0.08)
    take = lambda a: np.take_along_axis(
        np.asarray(a), np.asarray(gt_cell)[..., None], 2
    )
    assert np.median(take(log_new) - take(log_old)) > 0.0


def test_fine_supervision_offsets():
    # one sample, coarse grid 4x4 (w_c=4), window 5 => radius 2
    gt_cell = jnp.array([[5, -1, 10]], jnp.int32)  # point0 -> cell 5, point2 -> 10
    gt_fine_xy = jnp.array([[[9.0, 9.0], [0.0, 0.0], [17.0, 17.0]]])
    i_ids = jnp.array([[0, 2, 1]], jnp.int32)
    j_ids = jnp.array([[5, 3, 2]], jnp.int32)  # point0 correct, point2 wrong cell
    out = fine_supervision(
        i_ids, j_ids, gt_cell, gt_fine_xy, (4, 4), coarse_scale=8.0,
        fine_scale=2.0, window_size=5,
    )
    # cell 5 -> (col 1, row 1) * 8 = (8, 8); offset (1,1)/2/2 = 0.25
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.25, 0.25], atol=1e-6)
    # wrong cell -> gt location treated as 0 => large offset
    assert float(jnp.max(jnp.abs(out[0, 1]))) > 1.0


def test_fine_loss_masks_incorrect_and_invalid():
    expec_f = jnp.array([[[0.1, 0.1, 0.5], [0.0, 0.0, 0.5], [0.9, 0.9, 0.5]]])
    expec_f_gt = jnp.array([[[0.2, 0.2], [5.0, 5.0], [0.8, 0.8]]])
    mask = jnp.array([[True, True, False]])
    cfg = LossConfig()
    loss = float(fine_l2_std_loss(expec_f, expec_f_gt, mask, cfg))
    # only slot 0 is correct(|gt|<1) & valid: weight==1 (single valid inv-std
    # normalized by its own mean ... mean over 2 valid slots of equal std -> 1)
    want = (0.1**2 + 0.1**2)
    assert loss == pytest.approx(want, rel=1e-5)


@pytest.mark.slow
def test_fine_weight_autoscale_window9():
    """Effective fine weight is 0.25*(W/5)^2 (reference train_onepose_plus.py:41)."""
    from onepose_plus_plus_tpu.train.losses import (
        compute_losses,
        effective_fine_weight,
    )

    cfg = LossConfig()
    assert effective_fine_weight(cfg, 5) == pytest.approx(0.25)
    assert effective_fine_weight(cfg, 9) == pytest.approx(0.25 * (9 / 5) ** 2)

    rng = np.random.default_rng(1)
    n, l, s, k = 1, 8, 16, 4
    out = {
        "conf_matrix": jnp.asarray(
            rng.random((n, l, s)).astype(np.float32) * 0.9 + 0.05
        ),
        "i_ids": jnp.asarray(rng.integers(0, l, (n, k)).astype(np.int32)),
        "j_ids": jnp.asarray(rng.integers(0, s, (n, k)).astype(np.int32)),
        "hw_c": (4, 4),
        "expec_f": jnp.asarray(rng.random((n, k, 3)).astype(np.float32)),
        "match_mask": jnp.ones((n, k), bool),
    }
    batch = {
        "gt_cell": jnp.asarray(rng.integers(-1, s, (n, l)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray(rng.random((n, l, 2)).astype(np.float32) * 31),
    }
    for window in (5, 9):
        loss, scalars = compute_losses(out, batch, cfg, window_size=window)
        want = float(scalars["loss_c"]) * cfg.coarse_weight + float(
            scalars["loss_f"]
        ) * effective_fine_weight(cfg, window)
        assert float(loss) == pytest.approx(want, rel=1e-5)


def _tiny_cfg():
    return OnePosePlusConfig(
        coarse=TransformerConfig(d_model=256, nhead=8, layer_iter_n=1),
        coarse_matching=CoarseMatchingConfig(
            max_matches=16, train_max_matches=16, train_pad_num_gt_min=4
        ),
        fine=FineConfig(
            transformer=TransformerConfig(d_model=128, nhead=8, layer_iter_n=1)
        ),
    )


@pytest.mark.slow
def test_train_step_runs_and_decreases_loss():
    from onepose_plus_plus_tpu.train.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )

    rng_np = np.random.default_rng(1)
    n, img, l = 2, 64, 32
    s = (img // 8) ** 2
    batch = {
        "query_image": jnp.asarray(rng_np.random((n, img, img, 1), np.float32)),
        "keypoints3d": jnp.asarray(
            rng_np.standard_normal((n, l, 3)).astype(np.float32)
        ),
        "descriptors3d": jnp.asarray(
            rng_np.standard_normal((n, l, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng_np.standard_normal((n, l, 256)).astype(np.float32)
        ),
        "gt_cell": jnp.asarray(rng_np.integers(-1, s, (n, l)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray(
            (rng_np.random((n, l, 2)) * (img - 1)).astype(np.float32)
        ),
    }
    tc = TrainConfig()
    model, state = create_train_state(
        jax.random.PRNGKey(0), _tiny_cfg(), tc, batch, world_batch_size=n
    )
    import functools

    step = jax.jit(functools.partial(train_step, model, train_cfg=tc))
    losses = []
    for i in range(3):
        state, scalars = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(scalars["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch -> loss must drop


@pytest.mark.slow
def test_train_step_fused_coarse_path():
    """Fused train path (streaming selection + focal-loss VJP kernels,
    interpret mode on CPU): same params as the XLA path, loss_c agrees to
    bf16-similarity tolerance, and the loss decreases over steps."""
    import dataclasses
    import functools

    from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel
    from onepose_plus_plus_tpu.train.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )

    rng_np = np.random.default_rng(4)
    n, img, l = 2, 64, 32
    s = (img // 8) ** 2
    batch = {
        "query_image": jnp.asarray(rng_np.random((n, img, img, 1), np.float32)),
        "keypoints3d": jnp.asarray(
            rng_np.standard_normal((n, l, 3)).astype(np.float32)
        ),
        "descriptors3d": jnp.asarray(
            rng_np.standard_normal((n, l, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng_np.standard_normal((n, l, 256)).astype(np.float32)
        ),
        "gt_cell": jnp.asarray(rng_np.integers(-1, s, (n, l)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray(
            (rng_np.random((n, l, 2)) * (img - 1)).astype(np.float32)
        ),
    }
    tc = TrainConfig()
    cfg = _tiny_cfg()
    model, state = create_train_state(
        jax.random.PRNGKey(0), cfg, tc, batch, world_batch_size=n
    )
    fused_cfg = dataclasses.replace(
        cfg,
        coarse_matching=dataclasses.replace(
            cfg.coarse_matching, use_fused_kernel=True
        ),
    )
    fused_model = OnePosePlusModel(fused_cfg)  # same param tree

    step_xla = jax.jit(functools.partial(train_step, model, train_cfg=tc))
    step_fused = jax.jit(functools.partial(train_step, fused_model, train_cfg=tc))

    _, sc_xla = step_xla(state, batch, jax.random.PRNGKey(2))
    fstate, sc_fused = step_fused(state, batch, jax.random.PRNGKey(2))
    assert float(sc_fused["loss_c"]) == pytest.approx(
        float(sc_xla["loss_c"]), rel=0.15
    )
    assert float(sc_fused["max_conf"]) == pytest.approx(
        float(sc_xla["max_conf"]), rel=0.15
    )
    losses = [float(sc_fused["loss"])]
    for _ in range(2):
        fstate, sc = step_fused(fstate, batch, jax.random.PRNGKey(2))
        losses.append(float(sc["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_train_state_resume_roundtrip(tmp_path):
    """Full-state save/restore continues the run identically: restoring
    params+opt_state+step into a fresh state and stepping once matches
    stepping the uninterrupted original (reference resume_from_checkpoint)."""
    import functools

    from onepose_plus_plus_tpu.train.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )
    from onepose_plus_plus_tpu.utils.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    rng_np = np.random.default_rng(3)
    n, img, l = 1, 64, 16
    s = (img // 8) ** 2
    batch = {
        "query_image": jnp.asarray(rng_np.random((n, img, img, 1), np.float32)),
        "keypoints3d": jnp.asarray(
            rng_np.standard_normal((n, l, 3)).astype(np.float32)
        ),
        "descriptors3d": jnp.asarray(
            rng_np.standard_normal((n, l, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng_np.standard_normal((n, l, 256)).astype(np.float32)
        ),
        "gt_cell": jnp.asarray(rng_np.integers(-1, s, (n, l)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray(
            (rng_np.random((n, l, 2)) * (img - 1)).astype(np.float32)
        ),
    }
    tc = TrainConfig()
    model, state = create_train_state(
        jax.random.PRNGKey(0), _tiny_cfg(), tc, batch, world_batch_size=n
    )
    step = jax.jit(functools.partial(train_step, model, train_cfg=tc))

    state, _ = step(state, batch, jax.random.PRNGKey(7))
    state, _ = step(state, batch, jax.random.PRNGKey(8))
    save_train_state(str(tmp_path / "last_state"), state, epoch=2)

    # fresh run with a DIFFERENT init seed; restore must overwrite everything
    _, fresh = create_train_state(
        jax.random.PRNGKey(99), _tiny_cfg(), tc, batch, world_batch_size=n
    )
    restored, next_epoch = restore_train_state(str(tmp_path / "last_state"), fresh)
    assert next_epoch == 2
    assert int(restored.step) == int(state.step) == 2

    cont, sc_cont = step(state, batch, jax.random.PRNGKey(9))
    resumed, sc_res = step(restored, batch, jax.random.PRNGKey(9))
    assert float(sc_res["loss"]) == pytest.approx(float(sc_cont["loss"]), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(cont.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


class TestCallbacks:
    def test_checkpoint_artifact_rotation(self, tmp_path):
        import os

        from onepose_plus_plus_tpu.train import CheckpointArtifactCallback

        ckpt = tmp_path / "ckpt"
        (ckpt / "last").mkdir(parents=True)
        (ckpt / "last" / "x.bin").write_bytes(b"abc")
        cb = CheckpointArtifactCallback(str(ckpt), str(tmp_path / "art"), keep_last=2)
        for e in range(4):
            cb.on_epoch_end(e, None)
        kept = sorted(os.listdir(tmp_path / "art"))
        assert kept == ["epoch_2", "epoch_3"]

    def test_gradient_stats(self):
        import numpy as np

        from onepose_plus_plus_tpu.train import GradientStatsCallback

        class W:
            def __init__(self):
                self.logged = {}

            def add_scalar(self, k, v, s):
                self.logged[k] = v

        cb = GradientStatsCallback(every=1)
        cb.set_grads({"a": jnp.ones(4), "b": jnp.zeros(3)})
        w = W()
        cb.on_step(2, {}, w)
        assert np.isclose(w.logged["train/grad_global_norm"], 2.0)


@pytest.mark.slow
def test_grad_accum_updates_params_every_k_steps():
    """optax.MultiSteps wiring: params move only after grad_accum micro-steps."""
    import numpy as np

    from onepose_plus_plus_tpu.config import (
        CoarseMatchingConfig,
        FineConfig,
        OnePosePlusConfig,
        TransformerConfig,
    )
    from onepose_plus_plus_tpu.train.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )

    rng = np.random.default_rng(0)
    s = (32 // 8) ** 2
    batch = {
        "query_image": jnp.asarray(rng.random((1, 32, 32, 1), np.float32)),
        "keypoints3d": jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32)),
        "descriptors3d": jnp.asarray(
            rng.standard_normal((1, 16, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng.standard_normal((1, 16, 256)).astype(np.float32)
        ),
        "gt_cell": jnp.asarray(rng.integers(-1, s, (1, 16)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray(rng.random((1, 16, 2), np.float32) * 31),
    }
    cfg = OnePosePlusConfig(
        coarse=TransformerConfig(d_model=256, nhead=8, layer_iter_n=1),
        coarse_matching=CoarseMatchingConfig(
            max_matches=8, train_max_matches=8, train_pad_num_gt_min=2
        ),
        fine=FineConfig(
            transformer=TransformerConfig(d_model=128, nhead=8, layer_iter_n=1)
        ),
    )
    tc = TrainConfig(grad_accum=2)
    model, state = create_train_state(
        jax.random.PRNGKey(0), cfg, tc, batch, world_batch_size=2
    )
    p0 = state.params["loftr_coarse"]["layer_0"]["q_proj"]["kernel"]
    state, _ = train_step(model, state, batch, jax.random.PRNGKey(1), tc)
    p1 = state.params["loftr_coarse"]["layer_0"]["q_proj"]["kernel"]
    # first micro-step: accumulation only, no param change
    assert np.allclose(np.asarray(p0), np.asarray(p1))
    state, _ = train_step(model, state, batch, jax.random.PRNGKey(2), tc)
    p2 = state.params["loftr_coarse"]["layer_0"]["q_proj"]["kernel"]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


@pytest.mark.slow
def test_train_match_figure_callback():
    """enable_plotting parity (reference OnePosePlus_lightning_model.py:73-79):
    the callback renders a reprojection figure from the live batch and logs
    max_conf alongside the loss scalars."""
    from onepose_plus_plus_tpu.train.callbacks import TrainMatchFigureCallback
    from onepose_plus_plus_tpu.train.losses import LossConfig, compute_losses
    from onepose_plus_plus_tpu.train.train_step import (
        TrainConfig,
        create_train_state,
    )

    rng = np.random.default_rng(3)
    n, img, l = 2, 64, 32
    s = (img // 8) ** 2
    batch = {
        "query_image": jnp.asarray(rng.random((n, img, img, 1), np.float32)),
        "keypoints3d": jnp.asarray(rng.standard_normal((n, l, 3)).astype(np.float32)),
        "descriptors3d": jnp.asarray(
            rng.standard_normal((n, l, 128)).astype(np.float32)
        ),
        "descriptors3d_coarse": jnp.asarray(
            rng.standard_normal((n, l, 256)).astype(np.float32)
        ),
        "gt_cell": jnp.asarray(rng.integers(0, s, (n, l)).astype(np.int32)),
        "gt_fine_xy": jnp.asarray((rng.random((n, l, 2)) * (img - 1)).astype(np.float32)),
    }
    model, state = create_train_state(
        jax.random.PRNGKey(0), _tiny_cfg(), TrainConfig(), batch, world_batch_size=n
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # max_conf scalar present in compute_losses output
    out, _ = model.apply(
        variables,
        batch,
        train=True,
        rngs={"matching": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    _, scalars = compute_losses(out, batch, LossConfig(), window_size=5)
    assert 0.0 <= float(scalars["max_conf"]) <= 1.0

    cb = TrainMatchFigureCallback(model, every=1)
    cb.set_batch(batch, variables)
    fig = cb.make_figure(step=1)
    # random init: matches may or may not pass the confidence threshold, but
    # the path must run; with a figure, it must be a matplotlib Figure
    if fig is not None:
        import matplotlib.figure

        assert isinstance(fig, matplotlib.figure.Figure)

    class W:
        def __init__(self):
            self.figs = []

        def add_figure(self, tag, fig, step):
            self.figs.append(tag)

    w = W()
    cb.on_step(1, {}, w)
    assert (fig is None) or w.figs == ["train_match/reprojection"]
