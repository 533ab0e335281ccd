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
