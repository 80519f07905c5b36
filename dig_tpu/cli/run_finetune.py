"""Fine-tuning / evaluation entry point for scene-text recognition.

CLI-compatible with the reference launch (README.md:91-153):

    python -m dig_tpu.cli.run_finetune \
        --batch_size 256 --epochs 10 --warmup_epochs 1 \
        --model vit_small_patch4_32x128 --decoder_name tf_decoder \
        --use_abi_aug --nb_classes 97 --max_len 25 \
        --finetune checkpoint.pth --data_path ... --eval_data_path ...

Eval-only multi-benchmark sweep: pass --eval plus
--other_test_data_folders bench1 bench2 ... (run_class_finetuning.py:557-580).
"""

from __future__ import annotations

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.config import FinetuneConfig, config_to_json, parse_config
from dig_tpu.data.dataset import build_dataset
from dig_tpu.data.pipeline import DataLoader, make_train_loader
from dig_tpu.data.samplers import ShardedSampler
from dig_tpu.metrics.text import accuracy as word_accuracy
from dig_tpu.metrics.text import multi_label_f_measure, recognition_f_measure
from dig_tpu.models.rec_model import build_rec_model
from dig_tpu.optim import make_optimizer
from dig_tpu.parallel.mesh import create_mesh, host_local_rows, shard_batch
from dig_tpu.train.finetune import init_finetune_state, make_eval_step, make_finetune_step
from dig_tpu.train.state import TrainState
from dig_tpu.utils.charset import build_charset
from dig_tpu.utils.checkpoint import (
    auto_resume,
    convert_torch_encoder,
    convert_torch_recognizer,
    has_decoder_keys,
    load_torch_checkpoint,
    merge_pretrained_encoder,
    merge_pretrained_tree,
    restore_checkpoint,
    save_checkpoint,
)
from dig_tpu.utils.logging import JsonlLogger, ScreenTee, TensorboardLogger, is_main_process, print_every_rank
from dig_tpu.utils.rng import host_step_key
from dig_tpu.utils.metric_logger import MetricLogger
from dig_tpu.utils.schedules import cosine_schedule


def build_model(cfg: FinetuneConfig):
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    return build_rec_model(
        model_name=cfg.model,
        decoder_name=cfg.decoder_name,
        nb_classes=cfg.nb_classes,
        max_len=cfg.max_len,
        drop_rate=cfg.drop,
        attn_drop_rate=cfg.attn_drop_rate,
        drop_path_rate=cfg.drop_path,
        use_1d_attdec=cfg.use_1d_attdec,
        use_mean_pooling=cfg.use_mean_pooling,
        use_feat_distill=cfg.use_feat_distill,
        text_cond_vis=cfg.text_cond_vis,
        use_mim_proj=getattr(cfg, "use_mim_proj", False),
        dtype=dtype,
        model_kind=cfg.model_kind,
    )


def load_finetune_init(cfg: FinetuneConfig, state: TrainState,
                       model=None) -> TrainState:
    """--finetune checkpoint surgery: accepts a reference .pth (converted
    tensor-by-tensor, incl. the ``backbone.`` remap) or a dig_tpu
    checkpoint (SSL tree grafted onto the recognizer encoder).  A
    resolution-mismatched pos_embed is bicubically re-interpolated
    (run_class_finetuning.py:388-424)."""
    path = cfg.finetune
    grid = model.encoder.patch_shape if model is not None else None
    if path.endswith(".pth") or path.endswith(".pt"):
        sd = load_torch_checkpoint(path, model_key=cfg.model_key)
        if has_decoder_keys(sd):
            # finetuned reference checkpoint: the surgery loads the WHOLE
            # model dict — decoder + linear_norm included
            # (run_class_finetuning.py:362-441)
            tree = convert_torch_recognizer(sd)
            params = merge_pretrained_tree(state.params, tree,
                                           pos_embed_grid=grid)
        else:
            enc_tree = convert_torch_encoder(
                sd, prefix=cfg.model_prefix or "encoder.")
            params = merge_pretrained_encoder(state.params, enc_tree,
                                              pos_embed_grid=grid)
    else:
        payload = restore_checkpoint(path)
        src = payload["params"].get("encoder", payload["params"])
        params = merge_pretrained_encoder(state.params, src,
                                          pos_embed_grid=grid)
    return state.replace(params=params)


def evaluate_benchmark(cfg, model, params, data_path, eval_fn, charset,
                       accuracy_fn=None, mesh=None):
    """Greedy/beam decode over one benchmark LMDB; pads the last partial
    batch to keep shapes static.  With --dist_eval the set is sharded
    across hosts and metrics are reduced cross-host; without it every
    host evaluates the full set (the reference's DistributedSampler vs
    SequentialSampler split, run_class_finetuning.py:298-306).  Multi-
    process: batches go through `shard_batch` (global-array assembly)
    and each host scores only the rows it contributed."""
    ds = build_dataset(data_path, is_train=False, voc_type=cfg.voc_type,
                       max_len=cfg.max_len, img_height=cfg.input_h,
                       img_width=cfg.input_w)
    rank, world = jax.process_index(), jax.process_count()
    if not cfg.dist_eval:
        rank, world = 0, 1
    sampler = ShardedSampler(len(ds), rank=rank, world=world, shuffle=False)
    # per-host batch covering all local devices (divisible by the mesh)
    bs = cfg.batch_size * (jax.device_count() // jax.process_count())
    loader = DataLoader(ds, sampler, batch_size=bs, num_workers=cfg.num_workers,
                        drop_last=False)
    n_correct, n_total, f_sum, loss_sum, ml_sum = 0, 0, 0.0, 0.0, 0.0
    has_cls = False
    for images, targets, lens in loader:
        n = images.shape[0]
        if n < bs:  # pad to static shape
            pad = bs - n
            images = np.concatenate([images, np.zeros((pad, *images.shape[1:]), images.dtype)])
            targets = np.concatenate([targets, np.zeros((pad, targets.shape[1]), targets.dtype)])
            lens = np.concatenate([lens, np.ones((pad,), lens.dtype)])
        batch = {"images": images, "targets": targets,
                 "lengths": lens}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        else:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
        out = eval_fn(params, batch)
        ids, loss = out[0], out[1]
        ids = host_local_rows(ids)[:n]
        acc = (accuracy_fn or word_accuracy)(ids, targets[:n], charset)
        f = recognition_f_measure(ids, targets[:n], charset)
        n_correct += acc * n
        n_total += n
        f_sum += f * n
        # per-ROW losses: slice off the static-shape padding rows before
        # accumulating, or the pad rows' NLL skews the printed loss on
        # every set not divisible by the batch size
        loss_sum += float(np.asarray(host_local_rows(loss))[:n].sum())
        if len(out) == 3:  # seq_cls: char-presence multi-label F-measure
            # (≙ engine_for_finetuning.py:262-267: one-hot over ALL target
            # positions incl. padding ids, like the reference)
            has_cls = True
            cls_logit = np.asarray(host_local_rows(out[2]))[:n]
            presence = np.zeros((n, cls_logit.shape[-1]), np.float32)
            presence[np.arange(n)[:, None], targets[:n]] = 1.0
            ml_sum += multi_label_f_measure(cls_logit, presence) * n
    if cfg.dist_eval and jax.process_count() > 1:
        # cross-host metric reduction (≙ metric_logger.synchronize_between_processes,
        # engine_for_finetuning.py:276); without --dist_eval every host
        # already holds full-set metrics, so no reduction is needed
        from jax.experimental import multihost_utils

        sums = multihost_utils.process_allgather(
            np.array([n_correct, n_total, f_sum, loss_sum, ml_sum])
        )
        # plain python floats: np.float32 scalars would later poison the
        # json.dump of eval results / checkpoint meta
        n_correct, n_total, f_sum, loss_sum, ml_sum = (
            float(x) for x in sums.sum(axis=0))
    acc = n_correct / max(n_total, 1)
    # beam eval computes no teacher-forced loss (0 by convention inside
    # the step) — print n/a so a user can't misread "loss 0.0000"
    loss_str = ("n/a" if getattr(cfg, "beam_width", 0) > 0
                else f"{loss_sum / max(n_total, 1):.4f}")
    print(f"* {data_path}: {int(n_total)} images, Acc {acc:.4f} "
          f"loss {loss_str} "
          f"Rec_fmeasure {f_sum / max(n_total, 1):.4f}")
    result = {"acc": acc, "n": int(n_total),
              "fmeasure": f_sum / max(n_total, 1)}
    if has_cls:
        # ≙ the reference's extra line when cls_logit is present
        # (engine_for_finetuning.py:279-280)
        result["multi_label_fmeasure"] = ml_sum / max(n_total, 1)
        print(f"F_measure: {result['multi_label_fmeasure']:.4f}")
    return result


def main(cfg: FinetuneConfig):
    if is_main_process() and cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        ScreenTee(cfg.output_dir).install()
    print(config_to_json(cfg))

    if cfg.resume.endswith((".pth", ".pt")):
        raise ValueError(
            "--resume expects a native dig_tpu checkpoint directory; "
            "to initialize from a torch .pth use --finetune "
            f"(got --resume {cfg.resume})")
    if cfg.use_feat_distill and cfg.model_kind != "rec":
        # the distillation step's positional call signature only matches
        # RecModel (reference: feat_proj lives on RecModel only,
        # models/model_builder.py:113-115)
        raise ValueError(
            f"--use_feat_distill requires --model_kind rec "
            f"(got {cfg.model_kind})")
    if cfg.use_feat_distill and not cfg.teacher_ckpt and not cfg.eval:
        # without a teacher the generic step would silently drop s_feat
        # and train with the feat_proj MLP at zero gradient — the user
        # believes they are distilling but are not
        raise ValueError("--use_feat_distill requires --teacher_ckpt "
                         "(the frozen encoder to distill from)")

    # GELU form must be fixed BEFORE any model code is traced (see
    # dig_tpu/ops/activations.py).  Auto: converted .pth weights were
    # trained under torch's erf-GELU, so evaluate them under erf.
    from dig_tpu.ops import activations

    exact = activations.resolve_exact_gelu(
        cfg.exact_gelu, (cfg.finetune, cfg.resume))
    if exact and cfg.exact_gelu is None:
        print("torch checkpoint requested: using exact (erf) GELU "
              "(override with --exact_gelu false)")
    if exact != activations.EXACT:
        activations.set_exact(exact)

    n_devices = jax.device_count()
    cfg.finalize(n_devices)
    mesh = create_mesh(n_fsdp=cfg.n_fsdp, n_tensor=cfg.n_tensor)
    charset = build_charset(cfg.voc_type, cfg.max_len)
    assert charset.num_classes == cfg.nb_classes, (
        charset.num_classes, cfg.nb_classes)

    model = build_model(cfg)
    if cfg.model_kind == "ctc":
        from dig_tpu.metrics.text import ctc_accuracy
        from dig_tpu.train.finetune import make_ctc_eval_step

        eval_fn = make_ctc_eval_step(model, mesh=mesh)
        accuracy_fn = ctc_accuracy
    else:
        eval_fn = make_eval_step(model, beam_width=cfg.beam_width,
                                 eos=charset.eos_id, mesh=mesh,
                                 with_cls=cfg.model_kind == "seq_cls")
        accuracy_fn = None

    if cfg.eval:
        # eval-only sweep over benchmarks
        tx = make_optimizer(np.array([0.0], np.float32))
        state = init_finetune_state(model, tx, jax.random.PRNGKey(cfg.seed),
                                    max_len=cfg.max_len, model_kind=cfg.model_kind)
        if cfg.finetune:
            state = load_finetune_init(cfg, state, model)
        elif cfg.resume:
            payload = restore_checkpoint(cfg.resume)
            state = state.replace(params=payload["params"])
        paths = [p for p in [cfg.eval_data_path] + list(cfg.other_test_data_folders) if p]
        results = [
            dict(path=p, **evaluate_benchmark(cfg, model, state.params, p, eval_fn, charset, accuracy_fn, mesh=mesh))
            for p in paths
        ]
        total = sum(r["n"] for r in results)
        avg = sum(r["acc"] * r["n"] for r in results) / max(total, 1)
        print(f"average word accuracy over {len(results)} benchmarks: {avg:.4f}")
        if cfg.output_dir and is_main_process():
            # machine-readable sweep artifact (the reference only prints)
            import json

            with open(os.path.join(cfg.output_dir, "eval_results.json"), "w") as f:
                json.dump({"benchmarks": results, "average_acc": avg,
                           "n_images": int(total),
                           "beam_width": cfg.beam_width}, f, indent=2)
        return results

    rank, world = jax.process_index(), jax.process_count()
    rng = np.random.default_rng(cfg.seed + rank)
    train_ds = build_dataset(
        cfg.data_path, is_train=True, voc_type=cfg.voc_type, max_len=cfg.max_len,
        num_samples=cfg.num_samples, use_aug=cfg.num_view > 1,
        use_abi_aug=cfg.use_abi_aug and not cfg.device_abi_aug,
        img_height=cfg.input_h, img_width=cfg.input_w,
        rng=rng,
    )
    aug_fn = None
    if cfg.device_abi_aug and cfg.use_abi_aug:
        # ABI augmentation as its own jitted device program (frees the
        # cv2 host workers; see data/device_aug.device_abi_augment).
        # --device_abi_aug picks WHERE the aug runs; --no_use_abi_aug
        # still turns it off entirely
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dig_tpu.data.device_aug import device_abi_augment
        from dig_tpu.ops.images import to_model_images
        from dig_tpu.parallel.mesh import batch_sharding

        def _abi_aug(key, images):
            # uint8 transport: normalize before the [-1,1]-domain aug ops
            return device_abi_augment(key, to_model_images(images))

        aug_fn = jax.jit(_abi_aug,
                         in_shardings=(NamedSharding(mesh, P()),
                                       batch_sharding(mesh)))
    local_batch = cfg.batch_size * (n_devices // world)
    loader = make_train_loader(
        train_ds, local_batch=local_batch, rank=rank, world=world,
        seed=cfg.seed, num_workers=cfg.num_workers,
        worker_type=cfg.worker_type,
        batch_wise_shuffle=cfg.batch_wise_shuffle)
    steps_per_epoch = len(loader) // cfg.update_freq
    print(f"train: {len(train_ds)} imgs, {steps_per_epoch} steps/epoch")

    lr_sched = cosine_schedule(
        cfg.absolute_lr, cfg.min_lr, cfg.epochs, steps_per_epoch,
        warmup_epochs=cfg.warmup_epochs, start_warmup_value=cfg.warmup_lr,
        warmup_steps=cfg.warmup_steps,
    )
    wd_sched = cosine_schedule(cfg.weight_decay, cfg.weight_decay_end,
                               cfg.epochs, steps_per_epoch)
    from dig_tpu.optim import create_optimizer, frozen_encoder_mask

    tx = create_optimizer(
        cfg.opt, lr_sched, wd_sched, betas=cfg.opt_betas, eps=cfg.opt_eps,
        clip_grad=cfg.clip_grad, layer_decay=cfg.layer_decay,
        num_layers=model.encoder.depth,
        frozen=frozen_encoder_mask(cfg.fixed_encoder_layers)
        if cfg.fixed_encoder_layers > 0 else None,
    )
    if cfg.update_freq > 1:
        # gradient accumulation (--update_freq; engine_for_finetuning.py:84-140)
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=cfg.update_freq)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(cfg.seed),
                                max_len=cfg.max_len, model_kind=cfg.model_kind)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params / 1e6:.2f} M")

    if cfg.finetune:
        state = load_finetune_init(cfg, state, model)
    start_epoch = cfg.start_epoch
    if cfg.auto_resume and not cfg.resume:
        state, extra = auto_resume(cfg.output_dir, state)
        if extra is not None:
            start_epoch = int(extra.get("epoch", -1)) + 1

    if cfg.use_feat_distill and cfg.teacher_ckpt:
        from dig_tpu.train.finetune import make_distill_finetune_step

        t_payload = restore_checkpoint(cfg.teacher_ckpt)
        t_params = t_payload["params"]
        step_fn = make_distill_finetune_step(
            model, t_params, smoothing=cfg.smoothing,
            loss_weight_feat_distill=cfg.loss_weight_feat_distill, mesh=mesh,
        )
    elif cfg.model_kind == "ctc":
        from dig_tpu.train.finetune import make_ctc_step

        step_fn = make_ctc_step(model, blank_id=cfg.nb_classes, mesh=mesh)
    elif cfg.model_kind == "mim_rec":
        from dig_tpu.train.finetune import make_mim_finetune_step

        step_fn = make_mim_finetune_step(
            model, smoothing=cfg.smoothing, mask_ratio=cfg.mask_ratio,
            mim_sample_ratio=cfg.mim_sample_ratio,
            loss_weight_pixel=cfg.loss_weight_pixel,
            normalize_target=cfg.normlize_target, mesh=mesh)
    else:
        step_fn = make_finetune_step(model, smoothing=cfg.smoothing, mesh=mesh)
    tb = TensorboardLogger(cfg.log_dir or os.path.join(cfg.output_dir, "tb"))
    jsonl = JsonlLogger(cfg.output_dir)
    print_freq = 100
    max_accuracy = 0.0
    from dig_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard.install()

    from dig_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(os.path.join(cfg.output_dir, "profile"),
                             cfg.profile_steps, cfg.profile_start_step)

    for epoch in range(start_epoch, cfg.epochs):
        loader.sampler.set_epoch(epoch)
        logger = MetricLogger()
        for it, (images, targets, lens) in enumerate(
            logger.log_every(loader, print_freq, f"Epoch: [{epoch}]",
                             total=steps_per_epoch)
        ):
            batch = shard_batch(mesh, {
                "images": images, "targets": targets, "lengths": lens,
            })
            # host-built per-step keys: a split-chain here would issue
            # 1-2 eager device dispatches per step (utils/rng.py)
            gstep = epoch * steps_per_epoch + it
            if aug_fn is not None:
                asub = host_step_key(cfg.seed + 1, 1, gstep)
                batch["images"] = aug_fn(asub, batch["images"])
            sub = host_step_key(cfg.seed + 1, 0, gstep)
            state, metrics, pred_ids = step_fn(state, batch, sub)
            tracer.tick()
            # every=25: bounded-latency consensus (~seconds) without a
            # host-blocking collective per step (see sync_should_stop)
            if guard.sync_should_stop(step=it, every=25):
                # preemption: flush at the step boundary, exit clean.
                # extra epoch-1 => auto-resume redoes this epoch's data
                # pass with the (preserved) mid-epoch optimizer state.
                # sync_: all hosts agree even on a single-host SIGTERM.
                # Save regardless of --no_save_ckpt: the preemption
                # checkpoint is a resume artifact, not a periodic one.
                # Without an output_dir nothing can be saved — exit
                # nonzero so wrapping scripts (set -e studies) don't
                # report a partially-trained arm as completed.
                if cfg.output_dir:
                    save_checkpoint(cfg.output_dir, epoch, state,
                                    extra={"epoch": epoch - 1})
                    print_every_rank(f"[preemption] checkpointed at epoch {epoch} "
                          f"step {it}; exiting")
                    sys.exit(0)
                print_every_rank(f"[preemption] no output_dir to checkpoint to "
                      f"(epoch {epoch} step {it}); exiting 143")
                sys.exit(143)
            if it % print_freq == 0 or it == steps_per_epoch - 1:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                if not math.isfinite(host_metrics["loss"]):
                    print(f"Loss is {host_metrics['loss']}, stopping training")
                    sys.exit(1)
                if cfg.model_kind == "ctc":
                    from dig_tpu.metrics.text import ctc_accuracy

                    host_metrics["class_acc"] = ctc_accuracy(
                        host_local_rows(pred_ids), targets, charset)
                else:
                    host_metrics["class_acc"] = word_accuracy(
                        host_local_rows(pred_ids), targets, charset)
                logger.update(**host_metrics)
                tb.update(head="loss", step=int(state.step), **host_metrics)
            if (cfg.eval_freq and it >= 1 and it % cfg.eval_freq == 0
                    and cfg.eval_data_path):
                stats = evaluate_benchmark(cfg, model, state.params,
                                           cfg.eval_data_path, eval_fn, charset,
                                           accuracy_fn, mesh=mesh)
                if stats["acc"] > max_accuracy:
                    max_accuracy = stats["acc"]
                    if cfg.output_dir and cfg.save_ckpt and cfg.save_best:
                        save_checkpoint(cfg.output_dir, "best", state,
                                        extra={"epoch": epoch, "acc": stats["acc"]})
        print("Averaged stats:", logger)
        stats = {}
        if cfg.eval_data_path:
            stats = evaluate_benchmark(cfg, model, state.params,
                                       cfg.eval_data_path, eval_fn, charset,
                                       mesh=mesh)
            if stats["acc"] > max_accuracy:
                max_accuracy = stats["acc"]
                if cfg.output_dir and cfg.save_ckpt and cfg.save_best:
                    save_checkpoint(cfg.output_dir, "best", state,
                                    extra={"epoch": epoch, "acc": stats["acc"]})
        if cfg.output_dir and cfg.save_ckpt and (
            (epoch + 1) % cfg.save_ckpt_freq == 0 or epoch + 1 == cfg.epochs
        ):
            save_checkpoint(cfg.output_dir, epoch, state, extra={"epoch": epoch})
            if cfg.keep_ckpt_max > 0:
                from dig_tpu.utils.checkpoint import prune_checkpoints

                prune_checkpoints(cfg.output_dir, cfg.keep_ckpt_max)
        jsonl.write(
            epoch=epoch,
            **{f"train_{k}": m.global_avg for k, m in logger.meters.items()},
            val_acc=stats.get("acc"), max_accuracy=max_accuracy,
        )
    print(f"max accuracy: {max_accuracy:.4f}")
    tracer.close()  # flush a window the run ended inside of
    tb.flush()
    return state


if __name__ == "__main__":
    main(parse_config(FinetuneConfig))
