"""On-device batched augmentation (jittable).

The reference augments per-sample on CPU workers (imgaug/cv2 pipelines,
dataset/dataset_lmdb.py:102-153) — at TPU batch sizes the host becomes the
bottleneck.  This module generates the second MoCo view *on device* as one
fused XLA program over the whole batch: geometric warps are a single
batched bilinear gather, photometric ops are elementwise VPU work, and the
SimMIM masks come from `random_mask_batch`.  Distribution-matched to the
SeqCLR host pipeline (each op family present, magnitudes comparable), not
bit-identical — augmentation parity is distributional by nature.

Inputs/outputs are normalized float images ([-1, 1], mean=std=0.5) in NHWC.

Usage inside the pretrain step (``--device_aug``):

    aug = device_augment(key, images)          # [B, H, W, 3]
    masks = random_mask_batch(key2, b, n, num_mask, num_view)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dig_tpu.data.masking import random_mask_batch  # re-export for callers

__all__ = ["device_augment", "batched_affine_warp", "random_mask_batch"]


def batched_affine_warp(images: jnp.ndarray, inv_mats: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp: for each output pixel p, sample input at A_inv @ p.

    images [B, H, W, C]; inv_mats [B, 2, 3] (output->input mapping around
    the image center).  Edge-clamped (== cv2 BORDER_REPLICATE).
    """
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # [HW, 3] (x, y, 1)

    src = jnp.einsum("bij,nj->bni", inv_mats, grid)  # [B, HW, 2] (x, y)
    sx = src[..., 0] + (w - 1) / 2.0
    sy = src[..., 1] + (h - 1) / 2.0
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    flat = images.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32)  # [B, HW]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(b, h, w, c)


def _rand_affine_mats(key, b, degrees=10.0, scale=(0.8, 1.25), shear=15.0,
                      translate=0.1, h=32, w=128):
    """Per-sample inverse affine matrices [B, 2, 3]."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    angle = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees)
    angle = angle * (jnp.pi / 180.0)
    sc = jax.random.uniform(k2, (b,), minval=scale[0], maxval=scale[1])
    sh = jax.random.uniform(k3, (b,), minval=-shear, maxval=shear) * (jnp.pi / 180.0)
    tx = jax.random.uniform(k4, (b,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k5, (b,), minval=-translate, maxval=translate) * h

    cos, sin = jnp.cos(angle), jnp.sin(angle)
    tan = jnp.tan(sh)
    # forward matrix F = sc * rot @ shear_x
    #                 = sc * [[cos, -sin + cos*tan], [sin, cos + sin*tan]]
    f00 = sc * cos
    f01 = sc * (-sin + cos * tan)
    f10 = sc * sin
    f11 = sc * (cos + sin * tan)
    det = f00 * f11 - f01 * f10
    i00 = f11 / det
    i01 = -f01 / det
    i10 = -f10 / det
    i11 = f00 / det
    # inverse translation in source space
    itx = -(i00 * tx + i01 * ty)
    ity = -(i10 * tx + i11 * ty)
    return jnp.stack(
        [jnp.stack([i00, i01, itx], -1), jnp.stack([i10, i11, ity], -1)], axis=1
    )


def _gaussian_blur(images, sigma):
    """Fixed 5-tap separable gaussian, per-sample strength via lerp."""
    taps = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    x = images
    # depthwise via conv over H then W
    b, h, w, c = x.shape
    xt = x.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    kh = taps.reshape(1, 1, 5, 1)
    kw = taps.reshape(1, 1, 1, 5)
    y = jax.lax.conv_general_dilated(xt, kh, (1, 1), [(2, 2), (0, 0)])
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (2, 2)])
    y = y.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    s = sigma[:, None, None, None]
    return x * (1 - s) + y * s


def device_augment(key, images: jnp.ndarray,
                   p_geom: float = 0.5, p_blur: float = 0.3, p_jitter: float = 0.8,
                   p_gray: float = 0.2, p_noise: float = 0.25) -> jnp.ndarray:
    """SeqCLR-class augmentation for a whole batch in one fused program.

    images: normalized [-1, 1] float NHWC.  Each op is applied per-sample
    with its own probability gate and random magnitude.
    """
    b = images.shape[0]
    keys = jax.random.split(key, 12)
    x = images

    # --- geometry: batched affine (rotation/scale/shear/translate) ---------
    mats = _rand_affine_mats(keys[0], b, h=images.shape[1], w=images.shape[2])
    warped = batched_affine_warp(x, mats)
    geom_gate = jax.random.bernoulli(keys[1], p_geom, (b, 1, 1, 1))
    x = jnp.where(geom_gate, warped, x)

    # --- blur ----------------------------------------------------------------
    sigma = jax.random.uniform(keys[2], (b,), minval=0.3, maxval=1.0)
    blur_gate = jax.random.bernoulli(keys[3], p_blur, (b,))
    x = jnp.where(blur_gate[:, None, None, None],
                  _gaussian_blur(x, sigma), x)

    # --- color jitter: brightness / contrast / saturation --------------------
    jit_gate = jax.random.bernoulli(keys[4], p_jitter, (b, 1, 1, 1))
    bright = jax.random.uniform(keys[5], (b, 1, 1, 1), minval=-0.4, maxval=0.4)
    contrast = jax.random.uniform(keys[6], (b, 1, 1, 1), minval=0.6, maxval=1.4)
    sat = jax.random.uniform(keys[7], (b, 1, 1, 1), minval=0.8, maxval=1.2)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    jittered = (x - mean) * contrast + mean + bright
    gray = jnp.mean(jittered, axis=-1, keepdims=True)
    jittered = gray + (jittered - gray) * sat
    x = jnp.where(jit_gate, jittered, x)

    # --- grayscale ------------------------------------------------------------
    gray_gate = jax.random.bernoulli(keys[8], p_gray, (b, 1, 1, 1))
    x = jnp.where(gray_gate, jnp.mean(x, axis=-1, keepdims=True)
                  * jnp.ones_like(x), x)

    # --- gaussian noise ---------------------------------------------------------
    noise_gate = jax.random.bernoulli(keys[9], p_noise, (b, 1, 1, 1))
    noise = jax.random.normal(keys[10], x.shape) * 0.08
    x = jnp.where(noise_gate, x + noise, x)

    return jnp.clip(x, -1.0, 1.0).astype(images.dtype)
