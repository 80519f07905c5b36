"""DiG pre-training model: joint MoCo v3-style contrastive + SimMIM-style
masked image modeling (Flax).

Parity target: `MoCo_ViT` (reference: modeling_pretrain_moco_mim_ori.py:261-577)
with its window patch extractors (`PatchNet` :137-205, `ConvPatchNet`
:207-258), SimCLR-style projector/predictor MLPs with BatchNorm
(`_build_mlp` :463-482), pixel decoder (:422-426) and the registry configs
(:628-871).

TPU-native redesign notes:

* The momentum ("key") branch is NOT a second parameter-holding module.
  The student submodules double as the key branch: `forward_key` touches
  only the EMA-tracked submodules (encoder / projection / patch_extractor /
  pix_projector), so the train step applies it with the EMA parameter tree.
  EMA update order matches the reference (update *before* the momentum
  forward; :526-538).
* Projector BatchNorm computes statistics over the *global* logical batch:
  under `jit` over a data-sharded mesh this compiles to cross-chip psum —
  exactly the reference's SyncBatchNorm (run_mae_pretraining_moco.py:390)
  with no wrapper module.  Running averages are not tracked because the
  SSL graph never runs BN in eval mode (documented deviation).
* The masked-patch pixel loss uses a mask-weighted mean over all patches
  instead of a boolean gather (dynamic shapes); the mask has an exact
  per-sample count so the result is bit-identical math.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dig_tpu.models.layers import CrossBlock, xavier_uniform_init
from dig_tpu.models.registry import register_model
from dig_tpu.models.vit import PretrainViTEncoder
from dig_tpu.ops.activations import gelu


class BatchStatsNorm(nn.Module):
    """BatchNorm that always normalizes with current-batch statistics over
    all leading axes.  Under GSPMD the batch mean/var are global ==
    SyncBatchNorm.  torch defaults: eps=1e-5; `affine=False` drops the
    scale/bias (SimCLR last-BN convention)."""

    affine: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))
        # promote, never downcast: global-batch stats in f64 stay f64
        # (the x64 mesh-invariance test depends on it — reduction order
        # differs across shardings, and f32 rounding there would be
        # Adam-amplified into ~1e-4 param drift)
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
            y = y * scale + bias
        return y.astype(x.dtype)


class MLPHead(nn.Module):
    """SimCLR/MoCo-v3 projection head: Dense(no bias) + BN + ReLU per hidden
    layer, final Dense + affine-free BN (reference `_build_mlp`,
    modeling_pretrain_moco_mim_ori.py:463-482)."""

    num_layers: int
    mlp_dim: int
    output_dim: int
    last_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            dim = self.output_dim if layer == self.num_layers - 1 else self.mlp_dim
            x = nn.Dense(dim, use_bias=False, dtype=self.dtype, name=f"dense_{layer}")(x)
            if layer < self.num_layers - 1:
                x = BatchStatsNorm(dtype=self.dtype, name=f"bn_{layer}")(x)
                x = nn.relu(x)
            elif self.last_bn:
                x = BatchStatsNorm(affine=False, dtype=self.dtype, name=f"bn_{layer}")(x)
        return x


def adaptive_window_pool(x: jnp.ndarray, num_windows: int) -> jnp.ndarray:
    """[B, gh, gw, C] -> [B, num_windows, C]: full mean over height, PyTorch
    adaptive-average bins over width (reference pools with
    F.adaptive_avg_pool2d(x, (1, num_windows));
    modeling_pretrain_moco_mim_ori.py:192-193)."""
    b, gh, gw, c = x.shape
    x = x.mean(axis=1)  # [B, gw, C]
    lo = (jnp.arange(num_windows) * gw) // num_windows
    hi = ((jnp.arange(num_windows) + 1) * gw + num_windows - 1) // num_windows
    idx = jnp.arange(gw)
    bins = (idx[None, :] >= lo[:, None]) & (idx[None, :] < hi[:, None])
    w = bins.astype(x.dtype) / jnp.sum(bins, axis=1, keepdims=True).astype(x.dtype)
    return jnp.einsum("wn,bnc->bwc", w, x)


class PatchNet(nn.Module):
    """Horizontal window pooling, optionally refined by 2 cross-attention
    blocks querying the full token map
    (reference: modeling_pretrain_moco_mim_ori.py:137-205)."""

    embed_dim: int
    num_heads: int
    num_windows: int = 5
    patch_shape: Tuple[int, int] = (8, 32)
    depth: int = 2
    use_patch_transformer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq_x, deterministic: bool = True):
        b, n, c = seq_x.shape
        gh, gw = self.patch_shape
        x = adaptive_window_pool(seq_x.reshape(b, gh, gw, c), self.num_windows)
        if self.use_patch_transformer:
            for i in range(self.depth):
                x = CrossBlock(
                    num_heads=self.num_heads, qkv_bias=False, dtype=self.dtype,
                    name=f"blocks_{i}",
                )(x, kv=seq_x, deterministic=deterministic)
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class ConvPatchNet(nn.Module):
    """Conv feature pyramid over the 8x32 token map, pooled to windows and
    merged to one global vector
    (reference: modeling_pretrain_moco_mim_ori.py:207-258)."""

    embed_dim: int
    num_windows: int = 5
    patch_shape: Tuple[int, int] = (8, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq_x, deterministic: bool = True):
        b, n, c = seq_x.shape
        gh, gw = self.patch_shape
        x = seq_x.reshape(b, gh, gw, c)

        def conv_block(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"{name}_conv")(x)
            x = BatchStatsNorm(dtype=self.dtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        d = self.embed_dim
        x = conv_block(x, d, "c0")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv_block(x, int(d * 1.5), "c1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv_block(x, d * 2, "c2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv_block(x, d * 2, "c3")
        x = adaptive_window_pool(x, self.num_windows).reshape(b, -1)
        x = nn.Dense(d, dtype=self.dtype, name="p2g_dense0")(x)
        x = BatchStatsNorm(dtype=self.dtype, name="p2g_bn0")(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=self.dtype, name="p2g_dense1")(x)
        x = BatchStatsNorm(affine=False, dtype=self.dtype, name="p2g_bn1")(x)
        return x[:, None, :]


class PixDecoder(nn.Module):
    """Linear pixel regression head (reference:
    modeling_pretrain_moco_mim_ori.py:422-426)."""

    embed_dim: int = 192
    num_classes: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="fc0")(x)
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = gelu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class DiGPretrainModel(nn.Module):
    """Student-side modules of the DiG SSL graph.  The EMA (momentum) branch
    reuses these module definitions with an EMA parameter tree — see
    `ema_submodules()` and `dig_tpu.train.pretrain`."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 4
    encoder_embed_dim: int = 384
    encoder_depth: int = 12
    encoder_num_heads: int = 6
    decoder_num_classes: int = 48  # patch_size^2 * 3
    decoder_embed_dim: int = 192
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    mlp_dim: int = 4096
    dim: int = 256  # contrastive feature dim
    temperature: float = 0.2
    num_windows: int = 5
    use_pixel_target: bool = True
    use_moco_target: bool = True
    use_pix_projector: bool = True
    patchnet_name: str = "regular"  # regular | no_patchtrans | conv
    label_smoothing: float = 0.0
    remat: bool = False  # rematerialize encoder blocks (bandwidth-bound step)
    dtype: jnp.dtype = jnp.float32

    @property
    def patch_shape(self):
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self):
        gh, gw = self.patch_shape
        return gh * gw

    def setup(self):
        self.encoder = PretrainViTEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate, drop_path_rate=self.drop_path_rate,
            # MoCo_ViT strips the encoder's final LN (reference :362-363)
            use_final_norm=not self.use_moco_target,
            remat=self.remat,
            dtype=self.dtype,
        )
        if self.use_moco_target:
            self.projection = MLPHead(3, self.mlp_dim, self.dim, dtype=self.dtype)
            self.predictor = MLPHead(2, self.mlp_dim, self.dim, dtype=self.dtype)
            if self.patchnet_name == "conv":
                self.patch_extractor = ConvPatchNet(
                    embed_dim=self.encoder_embed_dim, num_windows=self.num_windows,
                    patch_shape=self.patch_shape, dtype=self.dtype,
                )
            else:
                self.patch_extractor = PatchNet(
                    embed_dim=self.encoder_embed_dim, num_heads=self.encoder_num_heads,
                    num_windows=self.num_windows, patch_shape=self.patch_shape,
                    use_patch_transformer=self.patchnet_name == "regular",
                    dtype=self.dtype,
                )
        if self.use_pixel_target:
            if self.use_moco_target and self.use_pix_projector:
                self.pix_projector = MLPHead(3, 512, self.encoder_embed_dim, dtype=self.dtype)
            self.pix_decoder = PixDecoder(
                embed_dim=self.decoder_embed_dim, num_classes=self.decoder_num_classes,
                dtype=self.dtype,
            )

    def ema_submodules(self):
        """Top-level param-tree keys tracked by the momentum EMA
        (reference `_update_momentum_encoder`,
        modeling_pretrain_moco_mim_ori.py:428-442)."""
        names = []
        if True:
            names.append("encoder")
        if self.use_moco_target:
            names += ["projection", "patch_extractor"]
        if self.use_pixel_target and self.use_moco_target and self.use_pix_projector:
            names.append("pix_projector")
        return names

    def _has_pix_projector(self):
        return self.use_pixel_target and self.use_moco_target and self.use_pix_projector

    def _encode(self, all_images, mask, deterministic):
        """Shared encoder trunk + optional pix projector on the first
        (masked/original) half.  Returns (features for contrastive branch,
        raw encoder output for the pixel branch)."""
        enc = self.encoder(all_images, mask, deterministic=deterministic)
        if self._has_pix_projector():
            b2, l, c = enc.shape
            masked_half, aug_half = jnp.split(enc, 2, axis=0)
            projected = self.pix_projector(masked_half.reshape(-1, c)).reshape(b2 // 2, l, c)
            feats = jnp.concatenate([projected, aug_half], axis=0)
            return feats, enc
        return enc, enc

    def forward_student(self, all_images, mask=None, deterministic: bool = True):
        """Student branch.  all_images [2B, H, W, C] = concat(ori, aug);
        mask [2B, N] or None.  Returns dict with q1/q2 ([B*W, dim]) and the
        pixel predictions [2B, N, p^2*3]."""
        out = {}
        feats, enc_raw = self._encode(all_images, mask, deterministic)
        if self.use_moco_target:
            patches = self.patch_extractor(feats, deterministic=deterministic)
            b2, w, c = patches.shape
            qs = self.predictor(self.projection(patches.reshape(b2 * w, c)))
            qs = qs.reshape(b2, w, -1)
            q1, q2 = jnp.split(qs, 2, axis=0)
            out["q1"] = q1.reshape(-1, q1.shape[-1])
            out["q2"] = q2.reshape(-1, q2.shape[-1])
        if self.use_pixel_target:
            # reference feeds the *pre-projector* encoder output when the
            # pix projector exists (temp_encoder_output; :500-510, :560-561)
            out["pix_pred"] = self.pix_decoder(enc_raw)
        return out

    def forward_key(self, all_images, mask=None, deterministic: bool = True):
        """Momentum branch: encoder -> (pix projector) -> patch extractor ->
        projection; no predictor (reference :525-549).  Apply with the EMA
        parameter tree and wrap in stop_gradient."""
        feats, _ = self._encode(all_images, mask, deterministic)
        patches = self.patch_extractor(feats, deterministic=deterministic)
        b2, w, c = patches.shape
        ks = self.projection(patches.reshape(b2 * w, c)).reshape(b2, w, -1)
        k1, k2 = jnp.split(ks, 2, axis=0)
        return k1.reshape(-1, k1.shape[-1]), k2.reshape(-1, k2.shape[-1])

    def __call__(self, all_images, mask=None, deterministic: bool = True):
        return self.forward_student(all_images, mask, deterministic)


_SIZES = {"micro": (64, 2), "tiny": (192, 3), "small": (384, 6), "base": (512, 8)}
_DEPTHS = {"micro": 2}


def _pretrain(size: str, use_pixel: bool, use_moco: bool, **kwargs):
    dim, heads = _SIZES[size]
    defaults = dict(
        img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
        encoder_depth=_DEPTHS.get(size, 12),
        encoder_num_heads=heads, decoder_num_classes=48, decoder_embed_dim=192,
        mlp_ratio=4.0, qkv_bias=True, use_pixel_target=use_pixel, use_moco_target=use_moco,
    )
    defaults.update(kwargs)
    return DiGPretrainModel(**defaults)


for _size in ("micro", "tiny", "small", "base"):
    for _name, _pix, _moco in (
        (f"pretrain_moco_ori_vit_{_size}_patch4_32x128", False, True),
        (f"pretrain_simmim_ori_vit_{_size}_patch4_32x128", True, False),
        (f"pretrain_simmim_moco_ori_vit_{_size}_patch4_32x128", True, True),
    ):
        register_model(
            (lambda s, p, m: (lambda **kw: _pretrain(s, p, m, **kw)))(_size, _pix, _moco),
            name=_name,
        )
