"""Optimizer, LR schedule, and the jittable data-parallel training step.

Replaces the reference's PyTorch-Lightning + DDP runtime
(``src/lightning_model/OnePosePlus_lightning_model.py:20-166``,
``src/models/OnePosePlus/optimizers/optimizers.py:4-42``) with optax + a pure
``train_step`` that is jit/pjit-ed over a ``Mesh(('data',))`` — gradient psum
over ICI replaces NCCL DDP. Reference hyperparameters kept: AdamW(lr, wd=0.1),
MultiStepLR milestones [3, 6, 9, 12] epochs × 0.5, canonical-LR scaling
``lr = 1e-4 * world_batch / 4`` (``train_onepose_plus.py:35-39``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import OnePosePlusConfig
from ..models.onepose_plus import OnePosePlusModel
from .losses import LossConfig, compute_losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    canonical_lr: float = 1e-4
    canonical_bs: int = 4
    # gradient accumulation steps (reference train.yaml accumulate_grad_batches)
    grad_accum: int = 1
    weight_decay: float = 0.1
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    milestones: Tuple[int, ...] = (3, 6, 9, 12)  # epochs
    gamma: float = 0.5
    warmup_steps: int = 0
    grad_clip: Optional[float] = None
    loss: LossConfig = LossConfig()

    def true_lr(self, world_batch_size: int) -> float:
        return self.canonical_lr * world_batch_size / self.canonical_bs


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
        )


def make_lr_schedule(
    cfg: TrainConfig, base_lr: float, steps_per_epoch: int
) -> optax.Schedule:
    """MultiStepLR(milestones, gamma) in steps, with optional linear warmup."""
    boundaries = {m * steps_per_epoch: cfg.gamma for m in cfg.milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, cfg.warmup_steps)
        sched = optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: TrainConfig, lr_schedule) -> optax.GradientTransformation:
    tx = optax.adamw(
        lr_schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, weight_decay=cfg.weight_decay
    )
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.grad_accum > 1:
        # reference PL accumulate_grad_batches=2 (train.yaml): params update
        # every grad_accum micro-batches with averaged gradients
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def create_train_state(
    rng: jax.Array,
    model_cfg: OnePosePlusConfig,
    train_cfg: TrainConfig,
    sample_batch: Dict[str, jnp.ndarray],
    world_batch_size: int,
    steps_per_epoch: int = 1000,
) -> Tuple[OnePosePlusModel, TrainState]:
    model = OnePosePlusModel(model_cfg)
    init_rng, match_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "matching": match_rng}, sample_batch, train=True
    )
    lr = train_cfg.true_lr(world_batch_size)
    tx = make_optimizer(train_cfg, make_lr_schedule(train_cfg, lr, steps_per_epoch))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def train_step(
    model: OnePosePlusModel,
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    train_cfg: TrainConfig,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. Pure; jit/pjit with batch sharded over the 'data' axis.

    Under ``jax.jit`` with sharded inputs XLA inserts the gradient psum
    automatically (SPMD), so this function contains no explicit collectives.
    """
    # fold the device-invariant step into the rng so GT-pad sampling varies
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        variables = {"params": params}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out, updated = model.apply(
            variables,
            batch,
            train=True,
            rngs={"matching": step_rng},
            mutable=mutable,
        )
        loss, scalars = compute_losses(
            out, batch, train_cfg.loss, model.cfg.fine.window_size
        )
        new_stats = updated.get("batch_stats", state.batch_stats)
        return loss, (scalars, new_stats)

    grads, (scalars, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, new_stats)
    return new_state, scalars
