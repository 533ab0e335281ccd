"""Training callbacks: checkpoint artifacts, gradient stats, LR logging.

Equivalent of reference ``src/callbacks/wandb_callbacks.py`` (code/ckpt
artifact upload, gradient watch — template leftovers mostly unused by
``train.yaml``), rebuilt as a minimal TensorBoard-backed callback list the
train CLI can drive. No W&B dependency; everything logs to the
SummaryWriter / filesystem.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Callback:
    def on_epoch_end(self, epoch: int, state, writer=None) -> None: ...

    def on_step(self, step: int, scalars: Dict[str, Any], writer=None) -> None: ...


class GradientStatsCallback(Callback):
    """Log global gradient/param norms (the 'watch model' equivalent)."""

    def __init__(self, every: int = 100):
        self.every = every
        self._last_grads = None

    def set_grads(self, grads) -> None:
        self._last_grads = grads

    def on_step(self, step, scalars, writer=None):
        if writer is None or step % self.every or self._last_grads is None:
            return
        leaves = jax.tree_util.tree_leaves(self._last_grads)
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        )
        writer.add_scalar("train/grad_global_norm", gnorm, step)


class CheckpointArtifactCallback(Callback):
    """Copy the latest checkpoint into an artifacts dir at epoch end
    (the 'upload ckpt as artifact' equivalent, kept on the filesystem)."""

    def __init__(self, ckpt_dir: str, artifact_dir: str, keep_last: int = 3):
        self.ckpt_dir = ckpt_dir
        self.artifact_dir = artifact_dir
        self.keep_last = keep_last

    def on_epoch_end(self, epoch, state, writer=None):
        src = os.path.join(self.ckpt_dir, "last")
        if not os.path.exists(src):
            return
        os.makedirs(self.artifact_dir, exist_ok=True)
        dst = os.path.join(self.artifact_dir, f"epoch_{epoch}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        existing = sorted(
            (d for d in os.listdir(self.artifact_dir) if d.startswith("epoch_")),
            key=lambda d: int(d.split("_")[1]),
        )
        for d in existing[: -self.keep_last]:
            shutil.rmtree(os.path.join(self.artifact_dir, d))


class TrainMatchFigureCallback(Callback):
    """Reprojection-pair figures from the live training batch.

    Reference ``training_step`` logs ``draw_reprojection_pair`` figures to
    TensorBoard every ``log_every_n_steps`` when ``trainer.enable_plotting``
    (``OnePosePlus_lightning_model.py:73-79``, ``train.yaml:37,147``). Here:
    an eval-mode forward on sample 0 of the current batch (jitted once),
    predicted fine matches plotted against their GT fine coordinates
    (``gt_fine_xy`` at the matched slots — correct under warp augmentation,
    where the GT pose no longer projects onto the warped image).
    """

    def __init__(self, model, every: int = 70, tag: str = "train_match/reprojection"):
        self.model = model
        self.every = every
        self.tag = tag
        self._batch = None
        self._variables = None
        self._fwd = None

    def set_batch(self, batch, variables) -> None:
        """Record the current device batch + model variables (cheap refs)."""
        self._batch = batch
        self._variables = variables

    def _forward(self):
        if self._fwd is None:
            def fwd(variables, batch1):
                # train-mode forward, like the reference: the plotted match
                # set includes the GT-padded training slots, so early-training
                # figures aren't empty (random weights yield ~0 confident
                # eval-mode matches)
                out, _ = self.model.apply(
                    variables,
                    batch1,
                    train=True,
                    rngs={"matching": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"],
                )
                return (
                    out["mkpts_query_f"][0],
                    out["i_ids"][0],
                    out["mconf"][0],
                    out["match_mask"][0],
                )

            self._fwd = jax.jit(fwd)
        batch1 = jax.tree_util.tree_map(lambda x: x[:1], self._batch)
        return self._fwd(self._variables, batch1), batch1

    def make_figure(self, step: int):
        from ..utils.plotting import plot_reprojection_comparison

        (mkpts_f, i_ids, mconf, mask), batch1 = self._forward()
        mkpts_f, i_ids, mask = np.asarray(mkpts_f), np.asarray(i_ids), np.asarray(mask)
        gt_fine = np.asarray(batch1["gt_fine_xy"])[0]
        gt = gt_fine[i_ids]
        # valid match slot AND a supervised GT projection (−50 sentinel = none)
        keep = mask.astype(bool) & (gt[:, 0] > -40.0)
        if not keep.any():
            return None
        image = np.asarray(batch1["query_image"])[0]
        return plot_reprojection_comparison(
            image, mkpts_f[keep], gt[keep], title=f"step {step}"
        )

    def on_step(self, step, scalars, writer=None):
        if writer is None or step % self.every or self._batch is None:
            return
        try:
            fig = self.make_figure(step)
        except Exception as e:  # plotting must never kill a training run
            import warnings

            warnings.warn(f"train figure failed at step {step}: {e!r}")
            return
        if fig is not None:
            writer.add_figure(self.tag, fig, step)
            import matplotlib.pyplot as plt

            plt.close(fig)


class LearningRateCallback(Callback):
    """Log the scheduled LR (reference LearningRateMonitor equivalent)."""

    def __init__(self, schedule, every: int = 50):
        self.schedule = schedule
        self.every = every

    def on_step(self, step, scalars, writer=None):
        if writer is None or step % self.every:
            return
        writer.add_scalar("train/lr", float(self.schedule(step)), step)


def run_callbacks_step(
    callbacks: List[Callback], step: int, scalars: Dict[str, Any], writer=None
) -> None:
    for cb in callbacks:
        cb.on_step(step, scalars, writer)


def run_callbacks_epoch(
    callbacks: List[Callback], epoch: int, state, writer=None
) -> None:
    for cb in callbacks:
        cb.on_epoch_end(epoch, state, writer)
