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

__all__ = ["device_augment", "device_abi_augment", "batched_affine_warp",
           "batched_projective_warp", "random_mask_batch"]


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


def batched_projective_warp(images: jnp.ndarray, inv_h: jnp.ndarray) -> jnp.ndarray:
    """Bilinear projective warp: sample input at (H_inv @ p) / z.

    images [B, H, W, C]; inv_h [B, 3, 3] output->input homographies in
    pixel coordinates (origin top-left).  Edge-clamped like the
    reference's cv2 BORDER_REPLICATE warps (transforms.py:390)."""
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], -1).reshape(-1, 3)  # [HW,3]

    src = jnp.einsum("bij,nj->bni", inv_h, grid)  # [B, HW, 3]
    z = jnp.where(jnp.abs(src[..., 2]) < 1e-6, 1e-6, src[..., 2])
    sx = jnp.clip(src[..., 0] / z, 0.0, w - 1.0)
    sy = jnp.clip(src[..., 1] / z, 0.0, h - 1.0)

    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx, fy = (sx - x0)[..., None], (sy - y0)[..., None]
    flat = images.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    top = gather(y0, x0) * (1 - fx) + gather(y0, x1) * fx
    bot = gather(y1, x0) * (1 - fx) + gather(y1, x1) * fx
    return (top * (1 - fy) + bot * fy).reshape(b, h, w, c)


def _affine_to_h(mats):
    """[B, 2, 3] affine (center-origin) -> [B, 3, 3] homography in
    top-left pixel coordinates, matching `batched_projective_warp`."""
    b = mats.shape[0]
    bottom = jnp.tile(jnp.array([[[0.0, 0.0, 1.0]]]), (b, 1, 1))
    return jnp.concatenate([mats, bottom], axis=1)


def _center_to_corner(h_mats, height, width):
    """Re-express a center-origin homography in corner-origin pixels."""
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    t = jnp.array([[1.0, 0, cx], [0, 1.0, cy], [0, 0, 1.0]])
    t_inv = jnp.array([[1.0, 0, -cx], [0, 1.0, -cy], [0, 0, 1.0]])
    return jnp.einsum("ij,bjk,kl->bil", t, h_mats, t_inv)


def _rand_abi_affine_mats(key, b, h, w, degrees=45.0, scale=(0.5, 2.0),
                          shear=(45.0, 15.0), rotation_only=False):
    """Inverse (output->input) affine mats, center-origin, matching the
    ABI CVRandomRotation / CVRandomAffine parameter ranges
    (dataset/dataset_lmdb.py:40: degrees=45, scale=(0.5,2), shear=(45,15))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees) * (jnp.pi / 180)
    if rotation_only:
        sc = jnp.ones((b,))
        shx = jnp.zeros((b,))
        shy = jnp.zeros((b,))
    else:
        sc = jax.random.uniform(k2, (b,), minval=scale[0], maxval=scale[1])
        shx = jax.random.uniform(k3, (b,), minval=-shear[0], maxval=shear[0]) * (jnp.pi / 180)
        shy = jax.random.uniform(k4, (b,), minval=-shear[1], maxval=shear[1]) * (jnp.pi / 180)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    tx, ty = jnp.tan(shx), jnp.tan(shy)
    # forward F = sc * R(ang) @ Shear(tx, ty); Shear = [[1, tx], [ty, 1]]
    f00 = sc * (cos + (-sin) * ty)
    f01 = sc * (cos * tx - sin)
    f10 = sc * (sin + cos * ty)
    f11 = sc * (sin * tx + cos)
    det = f00 * f11 - f01 * f10
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    inv = jnp.stack([
        jnp.stack([f11 / det, -f01 / det, jnp.zeros((b,))], -1),
        jnp.stack([-f10 / det, f00 / det, jnp.zeros((b,))], -1),
    ], axis=1)
    return inv


def _rand_perspective_h(key, b, h, w, distortion=0.5):
    """Inverse homographies for the ABI perspective op: the four image
    corners pulled inward by |N(0, d/2·dim)| offsets (CVRandomPerspective,
    transforms.py:361-392 with sample_asym), solved per sample by DLT."""
    kh, kw_ = jax.random.split(key)
    off_h = jnp.abs(jax.random.normal(kh, (b, 4))) * (distortion * h / 4)
    off_w = jnp.abs(jax.random.normal(kw_, (b, 4))) * (distortion * w / 4)
    off_h = jnp.clip(off_h, 0.0, distortion * h / 2)
    off_w = jnp.clip(off_w, 0.0, distortion * w / 2)
    # dst quad (where the corners land)
    dst = jnp.stack([
        jnp.stack([off_w[:, 0], off_h[:, 0]], -1),
        jnp.stack([w - 1 - off_w[:, 1], off_h[:, 1]], -1),
        jnp.stack([w - 1 - off_w[:, 2], h - 1 - off_h[:, 2]], -1),
        jnp.stack([off_w[:, 3], h - 1 - off_h[:, 3]], -1),
    ], axis=1)  # [B, 4, 2]
    src = jnp.tile(jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]]
    )[None], (b, 1, 1))
    # inverse map: output pixel (dst) -> input pixel (src)
    return _solve_homography(dst, src)


def _solve_homography(src, dst):
    """Batched 4-point DLT: H with H @ [src, 1] ~ [dst, 1].
    src/dst [B, 4, 2] -> [B, 3, 3]."""
    b = src.shape[0]
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], -1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], -1)
    a = jnp.concatenate([rows_u, rows_v], axis=1)  # [B, 8, 8]
    rhs = jnp.concatenate([u, v], axis=1)[..., None]  # [B, 8, 1]
    sol = jnp.linalg.solve(a, rhs)[..., 0]  # [B, 8]
    return jnp.concatenate([sol, jnp.ones((b, 1))], -1).reshape(b, 3, 3)


def _down_up(images, factor):
    """Gaussian-pyramid-style rescale: blur, resize down by `factor`,
    resize back (CVRescale, transforms.py:394-420)."""
    b, h, w, c = images.shape
    small = jax.image.resize(images, (b, h // factor, w // factor, c), "linear")
    return jax.image.resize(small, images.shape, "linear")


def _motion_blur(images, key, max_len=6.0):
    """Directional average over 7 bilinear taps along a random angle with
    a random support length (CVMotionBlur, transforms.py:437-455).
    Support length ≙ the reference's kernel degree
    ``max(int(beta(1,4)·degrees), 1)`` (transforms.py:440 via
    sample_asym); length 1 keeps only the center tap (no blur), like the
    reference's 1x1 kernel."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    ang = jax.random.uniform(k1, (b,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    length = jnp.maximum(
        jnp.floor(jax.random.beta(k2, 1.0, 4.0, (b,)) * max_len), 1.0)
    dx, dy = jnp.cos(ang), jnp.sin(ang)
    taps = jnp.arange(-3, 4, dtype=jnp.float32)  # 7 taps
    # per-sample translation-only affine mats for each tap offset
    out = jnp.zeros_like(images)
    wsum = jnp.zeros((b, 1, 1, 1))
    for j in range(7):
        t = taps[j]
        wgt = (jnp.abs(t) <= length / 2).astype(jnp.float32)[:, None, None, None]
        mats = jnp.stack([
            jnp.stack([jnp.ones((b,)), jnp.zeros((b,)), t * dx], -1),
            jnp.stack([jnp.zeros((b,)), jnp.ones((b,)), t * dy], -1),
        ], axis=1)
        out = out + wgt * batched_affine_warp(images, mats)
        wsum = wsum + wgt
    return out / jnp.maximum(wsum, 1.0)


def _rgb_hue_rotate(u, angle):
    """Rotate chroma in YIQ space (approximates HSV hue shift); u in
    [0, 1], angle [B] radians."""
    to_yiq = jnp.array([[0.299, 0.587, 0.114],
                        [0.596, -0.274, -0.322],
                        [0.211, -0.523, 0.312]])
    to_rgb = jnp.linalg.inv(to_yiq)
    yiq = jnp.einsum("ij,bhwj->bhwi", to_yiq, u)
    cos = jnp.cos(angle)[:, None, None]
    sin = jnp.sin(angle)[:, None, None]
    i = yiq[..., 1] * cos - yiq[..., 2] * sin
    q = yiq[..., 1] * sin + yiq[..., 2] * cos
    yiq = jnp.stack([yiq[..., 0], i, q], -1)
    return jnp.einsum("ij,bhwj->bhwi", to_rgb, yiq)


def device_abi_augment(key, images: jnp.ndarray,
                       p_geom: float = 0.5, p_deter: float = 0.25,
                       p_jitter: float = 0.25) -> jnp.ndarray:
    """On-device ABINet augmentation for a whole batch in one program.

    Distribution-matched to the reference recipe
    (dataset/dataset_lmdb.py:40-42): CVGeometry(degrees=45, scale=(0.5,2),
    shear=(45,15), distortion=0.5, p=0.5) choosing one of
    rotation/affine/perspective per sample; CVDeterioration(var=20,
    degrees=6, factor=4, p=0.25) = gaussian noise + motion blur + pyramid
    rescale; CVColorJitter(0.5/0.5/0.5/0.1, p=0.25).  Images are
    normalized [-1, 1] NHWC floats.  Parity is distributional (op
    families + magnitude ranges), like `device_augment`."""
    b, h, w, _ = images.shape
    keys = jax.random.split(key, 14)
    x = images

    # --- geometry: per-sample one of rotation / affine / perspective --------
    rot_h = _center_to_corner(_affine_to_h(
        _rand_abi_affine_mats(keys[0], b, h, w, rotation_only=True)), h, w)
    aff_h = _center_to_corner(_affine_to_h(
        _rand_abi_affine_mats(keys[1], b, h, w)), h, w)
    per_h = _rand_perspective_h(keys[2], b, h, w)
    t = jax.random.uniform(keys[3], (b, 1, 1))
    h_mats = jnp.where(t < 1 / 3, rot_h, jnp.where(t < 2 / 3, aff_h, per_h))
    geom_gate = jax.random.bernoulli(keys[4], p_geom, (b, 1, 1, 1))
    x = jnp.where(geom_gate, batched_projective_warp(x, h_mats), x)

    # --- deterioration: {noise, motion blur, pyramid rescale} in a random
    # order.  Magnitudes ≙ the reference's sample_asym = beta(1,4)·mag
    # (transforms.py:188-189, 425, 440); order ≙ the reference's
    # random.shuffle of the op list (transforms.py:483) — the reference
    # freezes order + magnitudes once per RUN (sampled in
    # CVDeterioration.__init__ and reused for every image), the host path
    # here re-samples per image, and this device path re-samples
    # magnitudes per sample and the order per BATCH (lax.switch over the
    # 6 permutations: one branch executes, so runtime cost is one
    # pipeline; per-sample order would triple the motion-blur warps).
    def _op_noise(xx, key):
        kv, kn = jax.random.split(key)
        var = jnp.maximum(
            jnp.floor(jax.random.beta(kv, 1.0, 4.0, (b, 1, 1, 1)) * 20.0), 1.0)
        sigma = jnp.sqrt(var) / 127.5  # pixel-space var -> [-1,1] std
        return xx + jax.random.normal(kn, xx.shape) * sigma

    def _op_blur(xx, key):
        return _motion_blur(xx, key)

    def _op_rescale(xx, key):
        # f = round(uniform(0,4)) (CVRescale, transforms.py:404): base
        # pyramid is 4x the 32x128 input, so f<=2 stays >= native res
        f = jax.random.uniform(key, (b, 1, 1, 1), minval=0.0, maxval=4.0)
        return jnp.where(f < 2.5, xx,
                         jnp.where(f < 3.5, _down_up(xx, 2),
                                   _down_up(xx, 4)))

    import itertools

    ops = [_op_noise, _op_blur, _op_rescale]
    op_keys = jax.random.split(keys[5], 3)

    def _deter_branch(perm):
        def run(xx):
            for i in perm:
                xx = ops[i](xx, op_keys[i])
            return xx
        return run

    order = jax.random.randint(keys[6], (), 0, 6)
    deteriorated = jax.lax.switch(
        order, [_deter_branch(p) for p in itertools.permutations(range(3))], x)
    deter_gate = jax.random.bernoulli(keys[9], p_deter, (b, 1, 1, 1))
    x = jnp.where(deter_gate, deteriorated, x)

    # --- color jitter incl. hue ---------------------------------------------
    u = (x + 1.0) * 0.5
    bright = jax.random.uniform(keys[10], (b, 1, 1, 1), minval=0.5, maxval=1.5)
    contrast = jax.random.uniform(keys[11], (b, 1, 1, 1), minval=0.5, maxval=1.5)
    sat = jax.random.uniform(keys[12], (b, 1, 1, 1), minval=0.5, maxval=1.5)
    k_hue, k_gate = jax.random.split(keys[13])
    hue = jax.random.uniform(k_hue, (b,), minval=-0.1, maxval=0.1) * 2 * jnp.pi
    v = u * bright
    v = (v - jnp.mean(v, axis=(1, 2, 3), keepdims=True)) * contrast \
        + jnp.mean(v, axis=(1, 2, 3), keepdims=True)
    gray = jnp.mean(v, axis=-1, keepdims=True)
    v = gray + (v - gray) * sat
    v = _rgb_hue_rotate(jnp.clip(v, 0.0, 1.0), hue)
    jit_gate = jax.random.bernoulli(k_gate, p_jitter, (b, 1, 1, 1))
    x = jnp.where(jit_gate, v * 2.0 - 1.0, x)

    return jnp.clip(x, -1.0, 1.0).astype(images.dtype)


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
