"""Optimizer factory (optax).

Parity targets (reference: optim_factory.py):

* decay / no-decay parameter split: 1-D params, biases and the model's
  `no_weight_decay()` names get weight decay 0 (:57-100),
* layer-wise learning-rate decay: per-parameter ``lr_scale =
  layer_decay ** (num_layers + 1 - layer_id)`` with the ViT layer-id map
  (:32-54; run_class_finetuning.py:471-473),
* AdamW with externally driven per-step LR and WD schedules — the
  reference assigns ``param_group['lr']`` / ``['weight_decay']`` from
  precomputed arrays every step (engine_for_finetuning.py:89-94).

Design: a single `optax.GradientTransformation` that reads the current LR
and WD from precomputed schedule arrays indexed by the step counter, so
the whole update stays inside the jitted train step.  Gradient clipping by
global norm matches `NativeScalerWithGradNormCount` (utils/utils.py:483-498).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = ("pos_embed", "cls_token", "mask_token")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def is_no_decay(path, leaf) -> bool:
    """1-D params, biases, norm scales, position/cls/mask tokens."""
    name = _path_str(path)
    if leaf.ndim <= 1:
        return True
    return any(tok in name for tok in NO_DECAY_NAMES)


def vit_layer_id(path, num_layers: int) -> int:
    """ViT depth index for layer-wise LR decay
    (reference: optim_factory.py:32-43).  Encoder prefixes are stripped
    like the reference's get_parameter_groups (:71-75)."""
    name = _path_str(path)
    if name.startswith("encoder/"):
        name = name[len("encoder/") :]
    first = name.split("/")[0]
    if first in ("cls_token", "mask_token", "pos_embed", "patch_embed"):
        return 0
    if first.startswith("blocks_"):
        return int(first.split("_")[1]) + 1
    return num_layers - 1


def layer_scales(params, layer_decay: float, num_layers: int):
    """Per-leaf lr multipliers: ``layer_decay ** (num_layers + 1 - id)``."""
    scales = [layer_decay ** (num_layers + 1 - i) for i in range(num_layers + 2)]

    def scale_for(path, leaf):
        lid = min(vit_layer_id(path, num_layers + 2), num_layers + 1)
        return scales[lid]

    return jax.tree_util.tree_map_with_path(scale_for, params)


def make_optimizer(
    params,
    lr_schedule,
    wd_schedule=None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    layer_decay: float = 1.0,
    num_layers: int = 12,
    extra_no_decay: Callable = None,
) -> optax.GradientTransformation:
    """AdamW with schedule-driven LR/WD, masked decay and layer-wise LR.

    `lr_schedule` / `wd_schedule` are numpy arrays indexed by step (the
    reference's precomputed cosine arrays, utils/utils.py:522-538).
    """
    lr_arr = jnp.asarray(lr_schedule, jnp.float32)
    wd_arr = None if wd_schedule is None else jnp.asarray(wd_schedule, jnp.float32)

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, l: not is_no_decay(p, l) and not (extra_no_decay and extra_no_decay(p, l)),
        params,
    )
    lr_scales = (
        layer_scales(params, layer_decay, num_layers)
        if layer_decay < 1.0
        else jax.tree_util.tree_map(lambda _: 1.0, params)
    )

    def init_fn(params):
        inner = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
        return {"adam": inner.init(params), "count": jnp.zeros((), jnp.int32)}

    adam = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)

    def update_fn(grads, state, params):
        step = state["count"]
        if clip_grad is not None:
            gnorm = optax.global_norm(grads)
            factor = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
        updates, adam_state = adam.update(grads, state["adam"], params)
        lr = lr_arr[jnp.minimum(step, lr_arr.shape[0] - 1)]
        wd = (
            wd_arr[jnp.minimum(step, wd_arr.shape[0] - 1)]
            if wd_arr is not None
            else jnp.float32(0.0)
        )

        def apply(u, p, use_decay, scale):
            d = wd * p if use_decay else 0.0
            return -(lr * scale) * (u + d)

        updates = jax.tree_util.tree_map(
            apply, updates, params, decay_mask, lr_scales
        )
        return updates, {"adam": adam_state, "count": step + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def global_grad_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)
