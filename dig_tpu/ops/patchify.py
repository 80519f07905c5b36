"""Patch <-> pixel reshapes and MIM pixel-target construction.

The reference builds the masked-image-modeling regression targets on the
GPU inside the engine loop with einops rearranges and boolean gathers
(reference: engine_for_pretraining_moco.py:83-111).  Boolean gathers are
shape-dynamic, so here the selection is deferred: targets are produced
for every patch and the loss is masked — identical math, static shapes,
fully fusable by XLA inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p, C] keeping pixel-within-patch
    and channel separate (matches the reference's 'b c (h p1) (w p2) ->
    b (h w) (p1 p2) c' rearrange)."""
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b gh gw p p c
    return x.reshape(b, gh * gw, p * p, c)


def unpatchify(patches: jnp.ndarray, patch_size: int, height: int, width: int) -> jnp.ndarray:
    """Inverse of `patchify`: [B, N, p*p*C] -> [B, H, W, C]."""
    b, n, d = patches.shape
    p = patch_size
    gh, gw = height // p, width // p
    c = d // (p * p)
    x = patches.reshape(b, gh, gw, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, height, width, c)


def mim_pixel_targets(
    images: jnp.ndarray,
    patch_size: int,
    normalize_target: bool = True,
    mean: float = 0.5,
    std: float = 0.5,
) -> jnp.ndarray:
    """Per-patch regression targets: un-normalize to [0,1], optionally
    standardize each patch over its pixels (unbiased variance, eps 1e-6 —
    engine_for_pretraining_moco.py:89-96), flatten to [B, N, p*p*C]."""
    unnorm = images * std + mean
    patches = patchify(unnorm, patch_size)  # [B, N, p*p, C]
    if normalize_target:
        mu = patches.mean(axis=-2, keepdims=True)
        n = patches.shape[-2]
        var = patches.var(axis=-2, keepdims=True) * (n / max(n - 1, 1))
        patches = (patches - mu) / (jnp.sqrt(var) + 1e-6)
    b, num, pp, c = patches.shape
    return patches.reshape(b, num, pp * c)
