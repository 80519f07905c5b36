"""Pre-training entry point (MoCo-v3 + SimMIM joint SSL).

CLI-compatible with the reference launch (README.md:53-79):

    python -m dig_tpu.cli.run_pretrain \
        --batch_size 128 --epochs 10 --warmup_steps 5000 \
        --model pretrain_simmim_moco_ori_vit_small_patch4_32x128 \
        --mask_ratio 0.7 --moco_t 0.2 --num_windows 4 \
        --loss_weight_pixel 1. --loss_weight_contrast 0.1 \
        --image_alone_path /path/to/lmdb ...

Distribution: the reference spawns one process per GPU under
`torch.distributed.launch`; here ONE process per host drives all local
chips through a jitted step over the device mesh.  Multi-host pods call
`jax.distributed.initialize()` first.
"""

from __future__ import annotations

import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.config import PretrainConfig, config_to_json, parse_config
from dig_tpu.data.dataset import build_pretraining_dataset
from dig_tpu.data.pipeline import device_prefetch, make_train_loader
from dig_tpu.models.registry import create_model
from dig_tpu.optim import make_optimizer
from dig_tpu.parallel.mesh import create_mesh, shard_batch
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.utils.checkpoint import auto_resume, restore_checkpoint, save_checkpoint
from dig_tpu.utils.logging import JsonlLogger, ScreenTee, TensorboardLogger, is_main_process, print_every_rank
from dig_tpu.utils.rng import host_step_key
from dig_tpu.utils.metric_logger import MetricLogger
from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)


def build_model(cfg: PretrainConfig):
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    return create_model(
        cfg.model,
        mlp_dim=cfg.moco_mlp_dim,
        dim=cfg.moco_dim,
        temperature=cfg.moco_t,
        num_windows=cfg.num_windows,
        patchnet_name=cfg.patchnet_name,
        label_smoothing=cfg.label_smoothing,
        drop_path_rate=cfg.drop_path,
        remat=cfg.remat,
        dtype=dtype,
    )


def main(cfg: PretrainConfig):
    if is_main_process() and cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        ScreenTee(cfg.output_dir).install()
    print(config_to_json(cfg))

    n_devices = jax.device_count()
    cfg.finalize(n_devices)
    mesh = create_mesh(n_fsdp=cfg.n_fsdp, n_tensor=cfg.n_tensor)
    print(f"devices: {n_devices}, mesh: {dict(mesh.shape)}, lr: {cfg.absolute_lr:.2e}")

    rank, world = jax.process_index(), jax.process_count()
    rng = np.random.default_rng(cfg.seed + rank)
    dataset = build_pretraining_dataset(
        cfg.image_alone_path,
        mask_ratio=cfg.mask_ratio,
        num_view=1 if cfg.device_aug else cfg.num_view,
        num_samples=cfg.aloneimage_num_samples,
        max_len=cfg.max_len,
        img_height=cfg.input_h,
        img_width=cfg.input_w,
        window_size=cfg.window_size,
        rng=rng,
    )
    # per-host batch covers all local devices (global batch = batch * world)
    local_batch = cfg.batch_size * (n_devices // world)
    loader = make_train_loader(
        dataset, local_batch=local_batch, rank=rank, world=world,
        seed=cfg.seed, num_workers=cfg.num_workers,
        worker_type=cfg.worker_type,
        batch_wise_shuffle=cfg.batch_wise_shuffle)
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * cfg.epochs
    print(f"dataset: {len(dataset)} imgs, {steps_per_epoch} steps/epoch")

    lr_sched = cosine_schedule(
        cfg.absolute_lr, cfg.min_lr, cfg.epochs, steps_per_epoch,
        warmup_epochs=cfg.warmup_epochs, start_warmup_value=cfg.warmup_lr,
        warmup_steps=cfg.warmup_steps,
    )
    wd_sched = cosine_schedule(cfg.weight_decay, cfg.weight_decay_end,
                               cfg.epochs, steps_per_epoch)
    mom_sched = moco_momentum_schedule(cfg.moco_m, cfg.epochs, steps_per_epoch,
                                       use_cosine=cfg.use_moco_m_cos)
    cw_sched = contrast_weight_schedule(
        cfg.loss_weight_contrast, cfg.epochs, steps_per_epoch,
        start_epoch=cfg.contrast_start_epoch, warmup_steps=cfg.contrast_warmup_steps,
    )

    model = build_model(cfg)
    from dig_tpu.optim import create_optimizer

    tx = create_optimizer(
        cfg.opt, lr_sched, wd_sched, betas=cfg.opt_betas, eps=cfg.opt_eps,
        clip_grad=cfg.clip_grad,
    )
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(cfg.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params / 1e6:.2f} M")

    start_epoch = cfg.start_epoch
    if cfg.resume:
        payload = restore_checkpoint(cfg.resume)
        state = state.replace(
            params=payload["params"], opt_state=payload["opt_state"],
            step=jnp.asarray(payload["step"], jnp.int32),
            ema_params=payload.get("ema_params", state.ema_params),
        )
        start_epoch = int(payload.get("extra", {}).get("epoch", -1)) + 1
    elif cfg.auto_resume:
        state, extra = auto_resume(cfg.output_dir, state)
        if extra is not None:
            start_epoch = int(extra.get("epoch", -1)) + 1

    step_fn = make_pretrain_step(
        model, mom_sched, cw_sched,
        loss_weight_pixel=cfg.loss_weight_pixel,
        only_mim_on_ori_img=cfg.only_mim_on_ori_img,
        normalize_target=cfg.normlize_target,
        mesh=mesh,
    )
    view_fn = None
    if cfg.device_aug:
        from dig_tpu.train.pretrain import make_device_view_fn

        view_fn = make_device_view_fn(model.num_patches, cfg.mask_ratio,
                                      cfg.num_view, mesh=mesh)

    tb = TensorboardLogger(cfg.log_dir or os.path.join(cfg.output_dir, "tb"))
    jsonl = JsonlLogger(cfg.output_dir)
    print_freq = 100
    from dig_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard.install()

    from dig_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(os.path.join(cfg.output_dir, "profile"),
                             cfg.profile_steps, cfg.profile_start_step)

    def to_device(item):
        ori, aug, mask = item
        if view_fn is not None:
            return shard_batch(mesh, {"images": ori})
        return shard_batch(mesh, {"images": ori, "aug_images": aug, "mask": mask})

    for epoch in range(start_epoch, cfg.epochs):
        loader.sampler.set_epoch(epoch)
        logger = MetricLogger()
        header = f"Epoch: [{epoch}]"
        batches = device_prefetch(iter(loader), to_device)
        for it, batch in enumerate(
            logger.log_every(batches, print_freq, header, total=steps_per_epoch)
        ):
            # host-built per-step keys: a split-chain here would issue
            # 1-2 eager device dispatches per step (utils/rng.py)
            gstep = epoch * steps_per_epoch + it
            sub = host_step_key(cfg.seed + 1, 0, gstep)
            if view_fn is not None:
                vsub = host_step_key(cfg.seed + 1, 1, gstep)
                batch = view_fn(vsub, batch["images"])
            state, metrics = step_fn(state, batch, sub)
            tracer.tick()
            # every=25: bounded-latency consensus (~seconds) without a
            # host-blocking collective per step (see sync_should_stop)
            if guard.sync_should_stop(step=it, every=25):
                # preemption: flush at the step boundary, exit clean
                # (extra epoch-1 => auto-resume redoes this epoch).
                # sync_: all hosts agree to stop even when the SIGTERM
                # reached only one, so the collective save below and the
                # rank-0 write gate line up
                if cfg.output_dir:
                    save_checkpoint(cfg.output_dir, epoch, state,
                                    extra={"epoch": epoch - 1})
                    print_every_rank(f"[preemption] checkpointed at epoch {epoch} "
                          f"step {it}; exiting")
                    sys.exit(0)
                # nothing saved: exit nonzero so wrappers don't count a
                # partial run as complete
                print_every_rank(f"[preemption] no output_dir to checkpoint to "
                      f"(epoch {epoch} step {it}); exiting 143")
                sys.exit(143)
            if it % print_freq == 0 or it == steps_per_epoch - 1:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                if not math.isfinite(host_metrics["loss"]):
                    print(f"Loss is {host_metrics['loss']}, stopping training")
                    sys.exit(1)
                logger.update(**host_metrics)
                tb.update(head="loss", step=int(state.step), **host_metrics)
            if cfg.eval_freq and it >= 1 and it % (cfg.eval_freq * 10) == 0:
                save_checkpoint(cfg.output_dir, f"{epoch}_{it}", state,
                                extra={"epoch": epoch})
        print("Averaged stats:", logger)
        if cfg.output_dir and (
            (epoch + 1) % cfg.save_ckpt_freq == 0 or epoch + 1 == cfg.epochs
        ):
            save_checkpoint(cfg.output_dir, epoch, state, extra={"epoch": epoch})
            if cfg.keep_ckpt_max > 0:
                from dig_tpu.utils.checkpoint import prune_checkpoints

                prune_checkpoints(cfg.output_dir, cfg.keep_ckpt_max)
        jsonl.write(
            epoch=epoch,
            **{f"train_{k}": m.global_avg for k, m in logger.meters.items()},
            n_parameters=int(n_params),
        )
    tracer.close()  # flush a window the run ended inside of
    tb.flush()
    return state


if __name__ == "__main__":
    main(parse_config(PretrainConfig))
