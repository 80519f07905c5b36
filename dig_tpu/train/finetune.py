"""Jitted fine-tuning / evaluation steps for recognition models.

Mirrors the reference fine-tune engine (engine_for_finetuning.py:26-210)
and evaluation (:213-285): teacher-forced label-smoothing CE during
training, greedy (or beam) decode + word accuracy at eval.  The eval loss
follows the reference's logging convention of applying the sequence CE to
the per-step softmax outputs (:232-249).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dig_tpu.losses.seq_ce import (
    seq_cross_entropy,
    seq_cross_entropy_rows,
    seq_label_smoothing_cross_entropy,
)
from dig_tpu.ops.images import to_model_images
from dig_tpu.parallel.mesh import batch_sharding
from dig_tpu.train.state import TrainState
from jax.sharding import NamedSharding, PartitionSpec as P


def init_finetune_state(model, tx, rng, batch_size: int = 2, max_len: int = 25,
                        model_kind: str = "rec"):
    img_size = model.encoder.img_size
    images = jnp.zeros((batch_size, *img_size, 3), jnp.float32)
    if model_kind == "ctc":
        variables = model.init(rng, images, True)
    elif model_kind == "mim_rec":
        # the MIM branch's pix head / projector only materialize when a
        # mask is supplied, so init must exercise that path
        targets = jnp.zeros((batch_size, max_len), jnp.int32)
        lens = jnp.ones((batch_size,), jnp.int32)
        mask = jnp.ones((batch_size, model.encoder.num_patches), bool)
        variables = model.init(rng, images, targets, lens, mask,
                               batch_size, True)
    else:
        targets = jnp.zeros((batch_size, max_len), jnp.int32)
        lens = jnp.ones((batch_size,), jnp.int32)
        variables = model.init(rng, images, targets, lens, True)
    return TrainState.create(variables["params"], tx)


def make_finetune_step(model, smoothing: float = 0.1, mesh=None):
    # gradient accumulation (--update_freq) lives in the optimizer
    # (optax.MultiSteps, run_finetune.py) — not a knob of the step fn
    def train_step(state: TrainState, batch, rng):
        # uint8 transport: normalize in-jit (4x cheaper H2D; ops/images.py)
        images = to_model_images(batch["images"])
        targets, lens = batch["targets"], batch["lengths"]

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, images, targets, lens, False, rngs={"dropout": rng}
            )
            if isinstance(logits, tuple):
                # SeqClsRecModel returns (logits, cls_logit, cls_maps); the
                # reference trains on the recognition CE only (the aux
                # multi-label BCE is eval-side; engine_for_finetuning.py:44,
                # :262-269)
                logits = logits[0]
            if smoothing > 0:
                loss = seq_label_smoothing_cross_entropy(logits, targets, lens, smoothing)
            else:
                loss = seq_cross_entropy(logits, targets, lens)
            return loss, logits

        import optax

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        pred_ids = jnp.argmax(logits, axis=-1)
        new_state = state.apply_gradients(grads)
        return new_state, metrics, pred_ids

    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(train_step, in_shardings=(None, shardings, NamedSharding(mesh, P())),
                   donate_argnums=0)


def make_distill_finetune_step(model, teacher_params, smoothing: float = 0.1,
                               loss_weight_feat_distill: float = 1.0, mesh=None):
    """Fine-tune with feature distillation against a frozen teacher encoder:
    smooth-L1 between the student's projected features and the layer-normed
    teacher features (reference: engine_for_finetuning.py:32-41,
    beta=2 huber)."""

    def train_step(state: TrainState, batch, rng):
        images = to_model_images(batch["images"])  # uint8 transport
        targets, lens = batch["targets"], batch["lengths"]
        t_feat = model.apply({"params": teacher_params}, images, True,
                             method=model.encode_features)
        t_feat = jax.lax.stop_gradient(
            jax.nn.standardize(t_feat.astype(jnp.float32), axis=-1, epsilon=1e-5)
        )

        def loss_fn(params):
            logits, s_feat = model.apply(
                {"params": params}, images, targets, lens, False,
                rngs={"dropout": rng},
            )
            loss_rec = seq_label_smoothing_cross_entropy(logits, targets, lens, smoothing)
            # smooth_l1 with beta=2
            diff = jnp.abs(s_feat.astype(jnp.float32) - t_feat)
            beta = 2.0
            huber = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
            loss_distill = jnp.mean(huber)
            loss = loss_rec + loss_weight_feat_distill * loss_distill
            return loss, (loss_rec, loss_distill, logits)

        (loss, (loss_rec, loss_distill, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "loss_rec": loss_rec, "loss_distill": loss_distill}
        return new_state, metrics, jnp.argmax(logits, axis=-1)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(train_step, in_shardings=(None, shardings, NamedSharding(mesh, P())),
                   donate_argnums=0)


def make_ctc_step(model, blank_id: int, mesh=None):
    """CTC training step for `CTCRecModel` — the reference ships the model
    and the CTC greedy-decode metric but never wires a CTC loss
    (models/model_builder.py:8-38; SURVEY.md §2.3); here it is a
    first-class capability via optax.ctc_loss."""
    import optax

    def train_step(state: TrainState, batch, rng):
        images = to_model_images(batch["images"])  # uint8 transport
        targets, lens = batch["targets"], batch["lengths"]

        def loss_fn(params):
            logits = model.apply({"params": params}, images, False,
                                 rngs={"dropout": rng})
            b, t, _ = logits.shape
            logit_paddings = jnp.zeros((b, t), jnp.float32)
            label_paddings = (
                jnp.arange(targets.shape[1])[None, :] >= (lens - 1)[:, None]
            ).astype(jnp.float32)  # drop the EOS token for CTC labels
            loss = optax.ctc_loss(
                logits.astype(jnp.float32), logit_paddings, targets,
                label_paddings, blank_id=blank_id,
            ).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}, jnp.argmax(logits, axis=-1)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(train_step, in_shardings=(None, shardings, NamedSharding(mesh, P())),
                   donate_argnums=0)


def make_mim_finetune_step(model, smoothing: float = 0.1,
                           mask_ratio: float = 0.7,
                           mim_sample_ratio: float = 0.5,
                           loss_weight_pixel: float = 1.0,
                           normalize_target: bool = True, mesh=None):
    """Fine-tuning with the auxiliary SimMIM pixel branch (`MimRecModel`;
    reference models/model_builder.py:204-290, which the reference never
    wires into an engine).  Per step: the first
    ``round(mim_sample_ratio * B)`` samples get exact-count random masks,
    the recognition CE covers the whole batch (masked samples optionally
    routed through `mim_proj`), and a masked-patch pixel MSE — the
    pretrain target construction (engine_for_pretraining_moco.py:83-111)
    — is added with weight ``loss_weight_pixel``.  Masks are generated
    inside the jitted step (device RNG), so the host pipeline is the
    plain labeled loader."""
    from dig_tpu.data.masking import random_mask_batch
    from dig_tpu.ops.patchify import mim_pixel_targets
    from dig_tpu.train.pretrain import masked_mse

    def train_step(state: TrainState, batch, rng):
        images = to_model_images(batch["images"])  # uint8 transport
        targets, lens = batch["targets"], batch["lengths"]
        b = images.shape[0]
        n = model.encoder.num_patches
        num_mim = int(round(mim_sample_ratio * b))
        k_mask, k_drop = jax.random.split(rng)
        if num_mim > 0:
            m = random_mask_batch(k_mask, num_mim, n,
                                  int(mask_ratio * n), 1)[:, 0]
            mask = jnp.zeros((b, n), bool).at[:num_mim].set(m)
        else:
            # mask=None skips the pixel branch entirely — an all-False
            # mask would still run the pix head over the full batch only
            # to discard it
            mask = None

        def loss_fn(params):
            out = model.apply(
                {"params": params}, images, targets, lens, mask, num_mim,
                False, rngs={"dropout": k_drop}
            )
            logits = out["rec_pred"]
            if smoothing > 0:
                rec = seq_label_smoothing_cross_entropy(logits, targets, lens, smoothing)
            else:
                rec = seq_cross_entropy(logits, targets, lens)
            loss = rec
            metrics = {"loss_rec": rec}
            if num_mim > 0:
                pix_targets = mim_pixel_targets(
                    images, model.encoder.patch_size, normalize_target)
                pix = masked_mse(out["pix_pred"], pix_targets, mask)
                loss = loss + pix * loss_weight_pixel
                metrics["loss_pixel"] = pix
            metrics["loss"] = loss
            return loss, (logits, metrics)

        import optax

        (loss, (logits, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        pred_ids = jnp.argmax(logits, axis=-1)
        new_state = state.apply_gradients(grads)
        return new_state, metrics, pred_ids

    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(train_step, in_shardings=(None, shardings, NamedSharding(mesh, P())),
                   donate_argnums=0)


def make_ctc_eval_step(model, mesh=None):
    """CTC eval: per-frame argmax (collapse happens in the metric;
    reference: evaluation_metric/metrics.py:205-251)."""

    def eval_step(params, batch):
        logits = model.apply({"params": params},
                             to_model_images(batch["images"]), True)
        # per-ROW zeros: eval losses are row vectors so callers can drop
        # static-shape padding rows (CTC reports no eval loss, like the
        # reference's beam path)
        loss = jnp.zeros((batch["images"].shape[0],), jnp.float32)
        return jnp.argmax(logits, axis=-1), loss

    if mesh is None:
        return jax.jit(eval_step)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(eval_step, in_shardings=(None, shardings))


def make_eval_step(model, beam_width: int = 0, eos: int = 94, mesh=None,
                   with_cls: bool = False):
    # Greedy eval decodes FULL length (eos=-1 disables the early-exit
    # while_loop): the logged loss applies seq CE to the per-step softmax
    # over the whole target mask, and early exit would leave positions
    # past the global stop step zero — scoring them as uniform instead of
    # the model's actual log-prob.  The reference always runs all
    # max_seq_len steps too (models/decoder.py:233).  Beam keeps the real
    # eos (kill-on-EOS semantics need it); its loss is 0 by convention.
    greedy_eos = -1 if beam_width == 0 else eos

    def eval_step(params, batch):
        images = to_model_images(batch["images"])  # uint8 transport
        targets, lens = batch["targets"], batch["lengths"]
        cls_logit = None
        if with_cls:
            # SeqClsRecModel: also surface the char-presence logits for
            # the eval-side multi-label F-measure (the reference computes
            # it whenever cls_logit is returned, engine_for_finetuning.py:262-269)
            probs, ids, cls_logit = model.apply(
                {"params": params}, images, beam_width, greedy_eos, True,
                method=model.recognize
            )
        else:
            probs, ids = model.apply(
                {"params": params}, images, beam_width, greedy_eos,
                method=model.recognize
            )
        if probs is not None:
            # reference logs SeqCE applied to the softmax outputs (:249).
            # Per-ROW losses, so callers can drop the static-shape padding
            # rows of a partial batch before averaging (a reduced-on-device
            # mean would bake the pad rows' NLL into the printed loss).
            loss = seq_cross_entropy_rows(jnp.log(probs + 1e-9), targets, lens)
        else:
            loss = jnp.zeros((targets.shape[0],), jnp.float32)
        if with_cls:
            return ids, loss, cls_logit
        return ids, loss

    if mesh is None:
        return jax.jit(eval_step)
    data = batch_sharding(mesh)
    shardings = {"images": data, "targets": data, "lengths": data}
    return jax.jit(eval_step, in_shardings=(None, shardings))
