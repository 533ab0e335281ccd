"""Training CLI — `python train_onepose_plus.py +experiment=train.yaml`.

CLI-parity entry point for reference ``train_onepose_plus.py``: LR/world-size
scaling, fine-loss-weight autoscale, epoch loop with MultiStep LR, TensorBoard
scalars, per-epoch orbax checkpoints (save_top_k=-1 + last, reference
``train.yaml:204-213``). PL + NCCL DDP is replaced by a jit-compiled SPMD
train step over a ``Mesh(('data',))`` with the batch sharded over devices.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

from onepose_plus_plus_tpu.data.dataset import (
    OnePosePlusTrainDataset,
    TrainLoader,
    load_manifest,
    records_from_coco,
)
from onepose_plus_plus_tpu.data.augment import build_augmentor
from onepose_plus_plus_tpu.models.build import onepose_config_from_dict
from onepose_plus_plus_tpu.train.losses import LossConfig
from onepose_plus_plus_tpu.train.train_step import (
    TrainConfig,
    create_train_state,
    train_step,
)
from onepose_plus_plus_tpu.utils import load_config, save_checkpoint
from onepose_plus_plus_tpu.utils.checkpoint import (
    restore_train_state,
    save_train_state,
)

CONFIGS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def load_records(path: str):
    import json

    with open(path) as f:
        doc = json.load(f)
    # merged COCO json (merge.py) is a dict with images/annotations;
    # a plain manifest is a list of frame records
    if isinstance(doc, dict) and "images" in doc:
        return records_from_coco(path)
    return load_manifest(path)


def train(cfg) -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from onepose_plus_plus_tpu.parallel.mesh import (
        device_prefetch,
        make_mesh,
        replicate,
        shard_batch,
    )

    np.random.seed(cfg.seed)
    devices = jax.devices()
    n_dev = cfg.trainer.n_devices
    if n_dev in (-1, None):
        n_dev = len(devices)
    devices = devices[:n_dev]

    per_dev_bs = cfg.trainer.batch_size
    world_bs = per_dev_bs * len(devices)
    grad_accum = int(cfg.trainer.get("grad_accum", 1))
    # reference LR rule (train_onepose_plus.py:35-39); the effective batch
    # includes gradient accumulation
    train_cfg = TrainConfig(
        canonical_lr=cfg.trainer.canonical_lr,
        canonical_bs=cfg.trainer.canonical_bs,
        grad_accum=grad_accum,
        weight_decay=cfg.trainer.wd,
        milestones=tuple(cfg.trainer.milestones),
        gamma=cfg.trainer.gamma,
        loss=LossConfig(
            coarse_weight=cfg.loss.coarse_weight,
            fine_weight=cfg.loss.fine_weight_base,  # autoscale in compute_losses
            # which coarse-loss semantics this config trains under — see the
            # loss.log_space comment in configs/experiment/train.yaml
            log_space=bool(cfg.loss.get("log_space", True)),
        ),
    )
    effective_bs = world_bs * grad_accum
    print(
        f"devices={len(devices)} world_bs={world_bs} grad_accum={grad_accum} "
        f"true_lr={train_cfg.true_lr(effective_bs):.2e}"
    )

    records = load_records(cfg.dataset.train_anno_file)
    dataset = OnePosePlusTrainDataset(
        records,
        img_size=cfg.dataset.img_resize,
        shape3d=cfg.dataset.shape3d_train,
        image_warp_adapt=cfg.dataset.image_warp_adapt,
        image_warp_all=bool(cfg.dataset.get("image_warp_all", False)),
        augmentor=build_augmentor(cfg.dataset.augmentor, cfg.seed),
        seed=cfg.seed,
    )
    loader = TrainLoader(
        dataset,
        batch_size=world_bs,
        seed=cfg.seed,
        num_workers=int(cfg.trainer.get("loader_workers", 4)),
        prefetch=int(cfg.trainer.get("loader_prefetch", 2)),
    )
    if len(dataset) < world_bs:
        raise SystemExit(
            f"dataset has {len(dataset)} samples but the world batch is "
            f"{world_bs} (batch_size x devices); drop_last would yield zero "
            "steps — reduce trainer.batch_size/n_devices or add data"
        )
    steps_per_epoch = max(1, len(dataset) // world_bs)

    model_cfg = onepose_config_from_dict(dict(cfg.get("model", {}) or {}))
    sample = next(loader.epoch(0))
    jb = {
        k: jnp.asarray(v)
        for k, v in sample.items()
        if k
        in (
            "query_image",
            "keypoints3d",
            "descriptors3d",
            "descriptors3d_coarse",
            "gt_cell",
            "gt_fine_xy",
        )
    }
    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_train_state(
        rng, model_cfg, train_cfg, jb, effective_bs, steps_per_epoch
    )

    ckpt_dir = os.path.join(cfg.ckpt_dir, cfg.exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)

    # resume: trainer.resume=true restores ckpt_dir/last_state; a string value
    # is an explicit checkpoint path (reference PL resume_from_checkpoint)
    start_epoch = 0
    resume = cfg.trainer.get("resume")
    if resume:
        resume_path = (
            resume
            if isinstance(resume, str)
            else os.path.join(ckpt_dir, "last_state")
        )
        if isinstance(resume, str) or os.path.exists(resume_path):
            state, start_epoch = restore_train_state(resume_path, state)
            print(
                f"resumed from {resume_path}: epoch {start_epoch}, "
                f"step {int(state.step)}"
            )
        else:
            # a kill mid-save leaves only last_state.orbax-checkpoint-tmp
            # (orbax writes are atomic: the final name appears on success) —
            # resume=true with no complete state trains from scratch instead
            # of crashing the chain
            print(
                f"resume requested but {resume_path} not found "
                "(interrupted save?) — training from scratch",
                flush=True,
            )

    mesh = make_mesh(devices)
    step_fn = jax.jit(functools.partial(train_step, model, train_cfg=train_cfg))

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(cfg.log_dir, cfg.exp_name))
    except Exception:
        pass

    log_every = int(cfg.trainer.get("log_every_n_steps", 50))
    fig_cb = None
    if cfg.trainer.get("enable_plotting") and writer is not None:
        from onepose_plus_plus_tpu.train.callbacks import TrainMatchFigureCallback

        fig_cb = TrainMatchFigureCallback(model, every=log_every)

    with mesh:
        state = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=replicate(state.opt_state, mesh),
            step=replicate(state.step, mesh),
        )
        global_step = int(state.step)
        for epoch in range(start_epoch, cfg.trainer.epochs):
            t0 = time.time()
            # epoch-derived rng so a resumed run draws the same GT-pad samples
            # as an uninterrupted one
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch + 1)

            def to_device(batch):
                return shard_batch(
                    {
                        k: v
                        for k, v in batch.items()
                        if k
                        in (
                            "query_image",
                            "keypoints3d",
                            "descriptors3d",
                            "descriptors3d_coarse",
                            "gt_cell",
                            "gt_fine_xy",
                        )
                    },
                    mesh,
                )

            for jbatch in device_prefetch(loader.epoch(epoch), to_device):
                rng, sub = jax.random.split(rng)
                state, scalars = step_fn(state, jbatch, sub)
                global_step += 1
                if global_step % log_every == 0 or global_step == 1:
                    loss = float(scalars["loss"])
                    print(
                        f"epoch {epoch} step {global_step} loss {loss:.4f} "
                        f"({time.time() - t0:.1f}s)"
                    )
                    if writer:
                        for k, v in scalars.items():
                            writer.add_scalar(f"train/{k}", float(v), global_step)
                    if fig_cb is not None:
                        fig_cb.set_batch(
                            jbatch,
                            {
                                "params": state.params,
                                "batch_stats": state.batch_stats,
                            },
                        )
                        fig_cb.on_step(global_step, scalars, writer)
            # per-epoch checkpoint (reference save_top_k=-1 + last)
            save_checkpoint(
                os.path.join(ckpt_dir, f"epoch_{epoch}"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            save_checkpoint(
                os.path.join(ckpt_dir, "last"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            # full state for resume (opt_state + step + next epoch)
            save_train_state(os.path.join(ckpt_dir, "last_state"), state, epoch + 1)
            # per-epoch validation: pose errors via the fused match+PnP step
            # (reference validation_step -> compute_query_pose_errors ->
            # aggregate_metrics, OnePosePlus_lightning_model.py:90-160)
            val_file = cfg.get_path("dataset.val_anno_file")
            if val_file and os.path.exists(str(val_file)):
                val_metrics = _validate(
                    model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    load_records(str(val_file)),
                    cfg,
                )
                print(f"epoch {epoch} val: {val_metrics}")
                if writer and val_metrics:
                    for k, v in val_metrics.items():
                        writer.add_scalar(f"val/{k}", float(v), global_step)
            print(f"epoch {epoch} done in {time.time() - t0:.1f}s -> {ckpt_dir}")
    if writer:
        writer.close()


def _validate(model, variables, records, cfg, max_frames: int = 64):
    """Pose-error validation over the val manifest via the fused match+PnP
    step. Frames share their object's annotation; metrics aggregate across
    processes with the multihost gather."""
    from onepose_plus_plus_tpu.data.dataset import OnePosePlusInferenceDataset
    from onepose_plus_plus_tpu.data.preprocessing import load_3d_annotation
    from onepose_plus_plus_tpu.eval.metrics import aggregate_metrics
    from onepose_plus_plus_tpu.inference.pipeline import run_inference
    from onepose_plus_plus_tpu.parallel.comm import gather_metrics

    by_anno = {}
    for r in records[:max_frames]:
        if r.avg_anno3d_file and r.pose is not None:
            by_anno.setdefault(r.avg_anno3d_file, []).append(r)
    all_R, all_t = [], []
    for anno_p, recs in by_anno.items():
        ds = OnePosePlusInferenceDataset(
            anno_p, recs, img_size=cfg.dataset.img_resize
        )
        res = run_inference(
            model,
            variables,
            ds.frames(),
            ds.annotation,
            shape3d=cfg.dataset.shape3d_train,
            frame_batch=4,
        )
        if res.R_errs is not None:
            all_R.extend(res.R_errs.tolist())
            all_t.extend(res.t_errs.tolist())
    gathered = gather_metrics({"R": all_R, "t": all_t})
    R = sum((g["R"] for g in gathered), [])
    t = sum((g["t"] for g in gathered), [])
    return aggregate_metrics(R, t) if R else {}


def main() -> None:
    cfg = load_config(CONFIGS_DIR, sys.argv[1:])
    if cfg.get("type") is None:
        raise SystemExit(
            "usage: python train_onepose_plus.py +experiment=train.yaml [overrides]"
        )
    globals()[cfg.type](cfg)


if __name__ == "__main__":
    main()
