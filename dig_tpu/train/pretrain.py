"""Jitted pre-training step: joint MoCo-v3 contrastive + SimMIM pixel loss.

Mirrors the per-step semantics of the reference engine
(engine_for_pretraining_moco.py:26-204) and model forward
(modeling_pretrain_moco_mim_ori.py:488-577):

1. per-step LR / WD / teacher-momentum / contrast-weight looked up from
   precomputed schedule arrays (engine :61-73; schedules live inside the
   optimizer / step closure here, so the whole step is one XLA program),
2. EMA update of the momentum branch *before* its forward (:526-538),
3. student forward on concat(ori, aug) with per-view masks,
4. symmetric InfoNCE(q1,k2) + InfoNCE(q2,k1) over globally gathered keys,
5. pixel MSE on masked patches of the original view (optionally both),
6. grad clip + AdamW update (bf16 needs no loss scaling).

Everything runs under one `jax.jit` over the mesh with the batch sharded
on the data axes; GSPMD inserts the gradient psum, the contrastive
all-gather and the global BatchNorm reductions on ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.losses.infonce import info_nce_loss
from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.ops.images import to_model_images
from dig_tpu.ops.patchify import mim_pixel_targets
from dig_tpu.parallel.mesh import batch_sharding
from dig_tpu.train.state import TrainState, ema_update
from jax.sharding import NamedSharding, PartitionSpec as P


def init_pretrain_state(model: DiGPretrainModel, tx, rng, batch_size: int = 2):
    """Initialize params + EMA copy of the momentum-tracked submodules
    (reference initializes the momentum branch as an exact copy;
    modeling_pretrain_moco_mim_ori.py:399-409)."""
    images = jnp.zeros((batch_size * 2, *model.img_size, 3), jnp.float32)
    mask = jnp.zeros((batch_size * 2, model.num_patches), bool)
    variables = model.init(rng, images, mask, True)
    params = variables["params"]
    # Deep-copy so EMA and student never alias device buffers (donation
    # would otherwise see the same buffer twice in one step).
    ema = jax.tree_util.tree_map(
        jnp.copy, {k: params[k] for k in model.ema_submodules() if k in params}
    )
    return TrainState.create(params, tx, ema_params=ema)


def masked_mse(pred, target, mask):
    """Mean squared error over masked patches only.  `mask` [B, N] has an
    exact per-sample count, so this equals the reference's gather+mse
    (engine_for_pretraining_moco.py:141)."""
    acc = jnp.promote_types(pred.dtype, jnp.float32)  # never downcast f64
    err = (pred.astype(acc) - target.astype(acc)) ** 2
    m = mask.astype(acc)[..., None]
    denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return jnp.sum(err * m) / denom


def make_pretrain_step(
    model: DiGPretrainModel,
    momentum_schedule: np.ndarray,
    contrast_weight_schedule: np.ndarray,
    loss_weight_pixel: float = 1.0,
    only_mim_on_ori_img: bool = True,
    normalize_target: bool = True,
    mesh=None,
    with_grad_norm: bool = True,
):
    mom_arr = jnp.asarray(momentum_schedule, jnp.float32)
    cw_arr = jnp.asarray(contrast_weight_schedule, jnp.float32)

    def train_step(state: TrainState, batch, rng):
        """batch: dict(images [B,H,W,3], aug_images [B,H,W,3],
        mask [B, num_view, N] bool).  With --device_aug the aug view and
        masks come from the separately-jitted `make_device_view_fn` program
        (keeping the big train-step compile lean)."""
        # uint8 transport: batches arrive as raw uint8 (4x cheaper H2D)
        # and normalize here, fused into the step program (ops/images.py)
        images = to_model_images(batch["images"])
        aug_images = to_model_images(batch["aug_images"])
        mask = batch["mask"]
        b = images.shape[0]
        n_views = mask.shape[1]
        # the graph is 2-view by construction, exactly like the
        # reference's MoCo_ViT (concat(ori, aug) chunked into q1/q2,
        # modeling_pretrain_moco_mim_ori.py:488-553); any other mask
        # width would mis-broadcast deep inside the encoder
        if n_views != 2:
            raise ValueError(
                f"pretrain step requires num_view == 2 (got mask "
                f"[B, {n_views}, N]) — the MoCo graph is two-view by "
                f"construction, like the reference's MoCo_ViT")

        step = jnp.minimum(state.step, mom_arr.shape[0] - 1)
        m = mom_arr[step]
        cw = cw_arr[step]

        # EMA update BEFORE the momentum forward (reference order, :526).
        new_ema = ema_update(
            state.ema_params,
            {k: state.params[k] for k in state.ema_params},
            m,
        )

        all_images = jnp.concatenate([images, aug_images], axis=0)
        if model.use_pixel_target:
            if only_mim_on_ori_img and n_views > 1:
                mask = mask.at[:, 1].set(False)  # aug view unmasked (engine :103-104)
            # [B, V, N] -> [V*B, N] row-aligned with concat(ori, aug)
            flat_mask = mask.transpose(1, 0, 2).reshape(-1, mask.shape[-1])
        else:
            flat_mask = None

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                all_images,
                flat_mask,
                False,
                rngs={"dropout": rng},
                method=model.forward_student,
            )
            metrics = {}
            loss = jnp.float32(0.0)

            if model.use_moco_target:
                k1, k2 = model.apply(
                    {"params": new_ema},
                    all_images,
                    flat_mask,
                    True,
                    method=model.forward_key,
                )
                k1, k2 = jax.lax.stop_gradient(k1), jax.lax.stop_gradient(k2)
                l1, (a1, a5) = info_nce_loss(
                    out["q1"], k2, model.temperature, model.label_smoothing, return_acc=True
                )
                l2, (b1_, b5) = info_nce_loss(
                    out["q2"], k1, model.temperature, model.label_smoothing, return_acc=True
                )
                contra = l1 + l2
                loss = loss + contra * cw
                metrics.update(
                    loss_contrast=contra, q1_acc1=a1, q1_acc5=a5, q2_acc1=b1_, q2_acc5=b5
                )

            if model.use_pixel_target:
                targets = mim_pixel_targets(
                    images, model.patch_size, normalize_target
                )  # [B, N, p^2*3] — targets always come from the ORI view,
                # even for the aug view's loss when only_mim_on_ori_img is
                # off: REFERENCE PARITY, the reference builds images_patch
                # from `images` only and scores every view against it
                # (engine_for_pretraining_moco.py:85-109), geometric aug
                # misalignment included
                preds = out["pix_pred"]  # [2B, N, p^2*3]
                pred_views = jnp.split(preds, 2, axis=0)
                n_loss_views = 1 if only_mim_on_ori_img else n_views
                loss_pixel = jnp.float32(0.0)
                for i in range(n_loss_views):
                    loss_pixel = loss_pixel + (1.0 / n_loss_views) * masked_mse(
                        pred_views[i], targets, mask[:, i]
                    )
                loss = loss + loss_pixel * loss_weight_pixel
                metrics["loss_pixel"] = loss_pixel

            metrics["loss"] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if with_grad_norm:
            # structurally identical to the optimizer's internal clip norm
            # so XLA CSEs the two into one reduction pass
            import optax

            metrics["grad_norm"] = optax.global_norm(grads)
        metrics["moco_m"] = m
        new_state = state.apply_gradients(grads, ema_params=new_ema)
        return new_state, metrics

    if mesh is None:
        fn = jax.jit(train_step, donate_argnums=0)
        fn.raw = train_step  # un-jitted step for composition (bench scan timing)
        return fn

    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    batch_shardings = {"images": data, "aug_images": data, "mask": data}
    fn = jax.jit(
        train_step,
        in_shardings=(None, batch_shardings, repl),
        donate_argnums=0,
    )
    fn.raw = train_step
    return fn


def make_device_view_fn(num_patches: int, mask_ratio: float = 0.7,
                        num_view: int = 2, mesh=None):
    """Jitted on-device view generator: images -> full pretrain batch
    (augmented second view + exact-count SimMIM masks).  Kept as its own
    XLA program so the train step's compile stays lean and the generator
    can overlap with the previous step's compute."""
    from dig_tpu.data.device_aug import device_augment, random_mask_batch

    def view_fn(rng, images):
        images = to_model_images(images)  # uint8 transport (ops/images.py)
        k_aug, k_mask = jax.random.split(rng)
        aug = device_augment(k_aug, images)
        mask = random_mask_batch(
            k_mask, images.shape[0], num_patches,
            int(mask_ratio * num_patches), num_view,
        )
        return {"images": images, "aug_images": aug, "mask": mask}

    if mesh is None:
        return jax.jit(view_fn)
    data = batch_sharding(mesh)
    return jax.jit(view_fn, in_shardings=(NamedSharding(mesh, P()), data))
