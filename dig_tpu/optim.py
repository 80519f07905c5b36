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


def _adamp_projection(p, g, perturb, delta, wd_ratio, eps):
    """AdamP/SGDP tangent-space projection (clovaai AdamP `_projection`):
    if a parameter looks scale-invariant (|cos(p, g)| small under the
    channel view, else the layer view), remove the radial component of the
    update and shrink its weight decay by `wd_ratio`.  Data-dependent in
    torch (early return per view); here both views are evaluated and
    selected with `where`, channel view taking priority like the
    reference's loop order."""
    import math

    if p.ndim < 2:
        return perturb, jnp.float32(1.0)

    def try_view(view):
        pv, gv, uv = view(p), view(g), view(perturb)
        pn_ = jnp.linalg.norm(pv, axis=1)
        gn_ = jnp.linalg.norm(gv, axis=1)
        cos = jnp.abs((pv * gv).sum(axis=1)) / (pn_ * gn_ + eps)
        hit = cos.max() < delta / math.sqrt(pv.shape[1])
        p_n = pv / (pn_[:, None] + eps)
        proj = (uv - p_n * (p_n * uv).sum(axis=1, keepdims=True)).reshape(
            perturb.shape)
        return hit, proj

    hit_c, proj_c = try_view(lambda x: x.reshape(x.shape[0], -1))
    hit_l, proj_l = try_view(lambda x: x.reshape(1, -1))
    out = jnp.where(hit_c, proj_c, jnp.where(hit_l, proj_l, perturb))
    ratio = jnp.where(hit_c | hit_l, jnp.float32(wd_ratio), jnp.float32(1.0))
    return out, ratio


def _scale_by_adamp(b1, b2, eps, delta=0.1, wd_ratio=0.01, nesterov=True):
    """AdamP (reference: optim_factory.py:144 calls AdamP with
    wd_ratio=0.01, nesterov=True).  State carries a per-leaf `wd_ratio`
    tree that `create_optimizer` folds into the decoupled weight decay."""

    def init(params):
        z = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        return {"mu": z(params), "nu": z(params),
                "count": jnp.zeros((), jnp.int32),
                "wd_ratio": jax.tree_util.tree_map(
                    lambda _: jnp.float32(1.0), params)}

    def update(grads, state, params):
        count = state["count"] + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)

        def perturb_of(m, v, g):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            num = (b1 * m + (1 - b1) * g) if nesterov else m
            return num / denom / bc1  # fold step_size = lr / bc1

        pert = jax.tree_util.tree_map(perturb_of, mu, nu, grads)
        proj = jax.tree_util.tree_map(
            lambda p, g, u: _adamp_projection(p, g, u, delta, wd_ratio, eps),
            params, grads, pert)
        updates = jax.tree_util.tree_map(
            lambda pr: pr[0], proj, is_leaf=lambda x: isinstance(x, tuple))
        ratios = jax.tree_util.tree_map(
            lambda pr: pr[1], proj, is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"mu": mu, "nu": nu, "count": count,
                         "wd_ratio": ratios}

    return optax.GradientTransformation(init, update)


def _scale_by_sgdp(momentum, delta=0.1, wd_ratio=0.1, nesterov=True):
    """SGDP (reference: optim_factory.py:148).  Note the torch SGDP scales
    weight decay by 1/(1-momentum) on top of the projection ratio — the
    per-leaf `wd_ratio` tree here includes that factor."""

    def init(params):
        return {"buf": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32),
                "wd_ratio": jax.tree_util.tree_map(
                    lambda _: jnp.float32(1.0), params)}

    def update(grads, state, params):
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + g, state["buf"], grads)
        d_p = jax.tree_util.tree_map(
            lambda g, b: (g + momentum * b) if nesterov else b, grads, buf)
        proj = jax.tree_util.tree_map(
            lambda p, g, u: _adamp_projection(p, g, u, delta, wd_ratio, 1e-8),
            params, grads, d_p)
        updates = jax.tree_util.tree_map(
            lambda pr: pr[0], proj, is_leaf=lambda x: isinstance(x, tuple))
        ratios = jax.tree_util.tree_map(
            lambda pr: pr[1] / (1.0 - momentum), proj,
            is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"buf": buf, "count": state["count"] + 1,
                         "wd_ratio": ratios}

    return optax.GradientTransformation(init, update)


def scale_by_adahessian(b1=0.9, b2=0.999, eps=1e-8):
    """AdaHessian second-moment-on-Hessian-diagonal transform (reference:
    optim_factory.py:154, a dead flag — never used by any README recipe).
    The Hessian diagonal cannot be derived from first-order grads, so the
    update takes it as an explicit pytree: ``update(grads, state, params,
    hess_diag=...)`` with `hutchinson_hessian_diag` as the estimator.
    The stock CLI train steps do not wire it (same status as the
    reference); custom steps can."""

    def init(params):
        z = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        return {"mu": z(params), "nu": z(params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None, *, hess_diag=None):
        if hess_diag is None:
            raise ValueError(
                "adahessian needs the Hessian diagonal: call "
                "update(grads, state, params, hess_diag=...) with "
                "dig_tpu.optim.hutchinson_hessian_diag(grad_fn, params, rng)"
            )
        count = state["count"] + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(
            lambda v, d: b2 * v + (1 - b2) * d * d, state["nu"], hess_diag)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformationExtraArgs(init, update)


def hutchinson_hessian_diag(grad_fn, params, rng):
    """One Rademacher sample of the Hessian diagonal: D ≈ z ⊙ (H z),
    computed as the JVP of `grad_fn` (grad-of-loss) at `params` along z.
    Exact for diagonal Hessians (z² = 1); unbiased in general."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    z = jax.tree_util.tree_unflatten(treedef, [
        jax.random.rademacher(k, l.shape, dtype=l.dtype)
        for k, l in zip(keys, leaves)
    ])
    _, hz = jax.jvp(grad_fn, (params,), (z,))
    return jax.tree_util.tree_map(lambda zi, hzi: zi * hzi, z, hz)


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
    if name == "adamp":
        # reference passes wd_ratio=0.01, nesterov=True (optim_factory.py:144)
        return _scale_by_adamp(betas[0], betas[1], eps)
    if name == "sgdp":
        return _scale_by_sgdp(momentum)
    if name == "adahessian":
        return scale_by_adahessian(betas[0], betas[1], eps)
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
        # AdamP/SGDP publish a per-leaf wd_ratio from the projection —
        # fold it into the decoupled decay (torch: p *= 1-lr*wd*wd_ratio)
        wd_ratios = (inner_state["wd_ratio"]
                     if isinstance(inner_state, dict)
                     and "wd_ratio" in inner_state
                     else jax.tree_util.tree_map(lambda _: 1.0, params))

        def apply(u, p, use_decay, scale, wdr):
            d = wd * wdr * p if use_decay else 0.0
            return -(lr * scale) * (u + d)

        updates = jax.tree_util.tree_map(apply, updates, params, decay_mask,
                                         lr_scales, wd_ratios)
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
