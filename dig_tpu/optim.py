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


def frozen_encoder_mask(num_frozen_layers: int):
    """Predicate marking encoder patch_embed + the first N blocks as frozen
    (reference: run_class_finetuning.py:500-516 sets requires_grad=False)."""

    def is_frozen(path, leaf) -> bool:
        if num_frozen_layers <= 0:
            return False
        name = _path_str(path)
        if not name.startswith("encoder/"):
            return False
        first = name.split("/")[1]
        if first in ("patch_embed", "pos_embed", "cls_token", "mask_token"):
            return True
        if first.startswith("blocks_"):
            return int(first.split("_")[1]) < num_frozen_layers
        return False

    return is_frozen


def make_optimizer(
    lr_schedule,
    wd_schedule=None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    layer_decay: float = 1.0,
    num_layers: int = 12,
    extra_no_decay: Callable = None,
    frozen: Callable = None,
) -> optax.GradientTransformation:
    """AdamW (the reference's default) with schedule-driven LR/WD, masked
    decay and layer-wise LR — a thin alias of `create_optimizer`.

    `lr_schedule` / `wd_schedule` are numpy arrays indexed by step (the
    reference's precomputed cosine arrays, utils/utils.py:522-538)."""
    return create_optimizer(
        "adamw", lr_schedule, wd_schedule, betas=betas, eps=eps,
        clip_grad=clip_grad, layer_decay=layer_decay, num_layers=num_layers,
        extra_no_decay=extra_no_decay, frozen=frozen,
    )


def global_grad_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)


def _inner_transform(opt_name: str, betas, eps, momentum):
    """Name-dispatched second-moment transforms mirroring the reference
    factory (optim_factory.py:128-181).  Apex 'fused*' variants map to the
    plain optax transforms — on TPU everything is XLA-fused anyway; the
    'lookahead' prefix wraps the inner optimizer like timm's Lookahead."""
    name = opt_name.lower().split("_")[-1]
    if name in ("sgd", "nesterov", "fusedsgd"):
        return optax.trace(decay=momentum, nesterov=True)
    if name in ("momentum", "fusedmomentum"):
        return optax.trace(decay=momentum, nesterov=False)
    if name in ("adam", "fusedadam"):
        return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    if name in ("adamw", "fusedadamw"):
        return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    if name == "nadam":
        return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, nesterov=True)
    if name == "radam":
        return optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps)
    if name == "adadelta":
        return optax.scale_by_adadelta(eps=eps)
    if name == "adafactor":
        return optax.scale_by_factored_rms()
    if name in ("rmsprop", "rmsproptf"):
        return optax.scale_by_rms(decay=0.9, eps=eps)
    if name in ("lamb", "fusedlamb"):
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale_by_trust_ratio(),
        )
    if name == "lars":
        return optax.chain(
            optax.trace(decay=momentum, nesterov=False), optax.scale_by_trust_ratio()
        )
    if name in ("novograd", "nvnovograd", "fusednovograd"):
        return optax.scale_by_novograd(b1=betas[0], b2=betas[1], eps=eps)
    if name == "lion":
        return optax.scale_by_lion(b1=betas[0], b2=betas[1])
    raise ValueError(f"Invalid optimizer '{opt_name}'")


def create_optimizer(
    opt_name: str,
    lr_schedule,
    wd_schedule=None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    momentum: float = 0.9,
    clip_grad: Optional[float] = None,
    layer_decay: float = 1.0,
    num_layers: int = 12,
    extra_no_decay: Callable = None,
    frozen: Callable = None,
) -> optax.GradientTransformation:
    """General factory (≙ create_optimizer, optim_factory.py:103-187):
    any supported optimizer name with masked decoupled weight decay,
    layer-wise LR and schedule-driven LR/WD.  Decay is decoupled (AdamW
    style) for every optimizer — matching the reference's
    get_parameter_groups treatment, where wd is applied per group.
    `frozen(path, leaf)` marks parameters whose lr scale is forced to 0
    (≙ requires_grad=False layer freezing)."""
    lr_arr = jnp.asarray(lr_schedule, jnp.float32)
    wd_arr = None if wd_schedule is None else jnp.asarray(wd_schedule, jnp.float32)
    use_lookahead = opt_name.lower().startswith("lookahead_")
    inner = _inner_transform(opt_name, betas, eps, momentum)

    def masks_for(params):
        decay_mask = jax.tree_util.tree_map_with_path(
            lambda p, l: not is_no_decay(p, l)
            and not (extra_no_decay and extra_no_decay(p, l)),
            params,
        )
        lr_scales = (
            layer_scales(params, layer_decay, num_layers)
            if layer_decay < 1.0
            else jax.tree_util.tree_map(lambda _: 1.0, params)
        )
        if frozen is not None:
            lr_scales = jax.tree_util.tree_map_with_path(
                lambda p, s: 0.0 if frozen(p, None) else s, lr_scales
            )
        return decay_mask, lr_scales

    def init_fn(params):
        state = {"inner": inner.init(params), "count": jnp.zeros((), jnp.int32)}
        if use_lookahead:
            state["slow"] = jax.tree_util.tree_map(jnp.copy, params)
        return state

    def update_fn(grads, state, params):
        decay_mask, lr_scales = masks_for(params)
        step = state["count"]
        if clip_grad is not None:
            gnorm = optax.global_norm(grads)
            factor = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
        updates, inner_state = inner.update(grads, state["inner"], params)
        lr = lr_arr[jnp.minimum(step, lr_arr.shape[0] - 1)]
        wd = (
            wd_arr[jnp.minimum(step, wd_arr.shape[0] - 1)]
            if wd_arr is not None
            else jnp.float32(0.0)
        )

        def apply(u, p, use_decay, scale):
            d = wd * p if use_decay else 0.0
            return -(lr * scale) * (u + d)

        updates = jax.tree_util.tree_map(apply, updates, params, decay_mask, lr_scales)
        new_state = {"inner": inner_state, "count": step + 1}
        if use_lookahead:
            # timm Lookahead defaults: k=6, alpha=0.5
            k, alpha = 6, 0.5
            fast = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            sync = (step + 1) % k == 0
            slow = jax.tree_util.tree_map(
                lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
                state["slow"], fast,
            )
            fast_final = jax.tree_util.tree_map(
                lambda s, f: jnp.where(sync, s, f), slow, fast
            )
            updates = jax.tree_util.tree_map(lambda ff, p: ff - p, fast_final, params)
            new_state["slow"] = slow
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
