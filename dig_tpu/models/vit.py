"""ViT encoders (Flax).

Parity targets:

* `VisionTransformer` — the fine-tune encoder that returns the full
  256-token feature map (reference: modeling_finetune.py:213-366), with
  optional sequence cls-tokens and mean pooling,
* `PretrainViTEncoder` — SimMIM-style masked encoder that keeps all
  tokens and substitutes masked positions with a learned mask token
  (reference: modeling_pretrain_vit.py:27-111),
* the registry names `vit_*_patch4_32x128` / `simmim_vit_*_patch4_32x128`
  (modeling_finetune.py:429-451, modeling_pretrain_vit.py:114-136).

Width table (reference registry): tiny=192/3h, small=384/6h, base=512/8h,
all depth 12, patch 4, image 32x128 -> 8x32 = 256 tokens.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.models.layers import (
    Block,
    PatchEmbed,
    sinusoid_position_table,
    trunc_normal_init,
)
from dig_tpu.models.registry import register_model


class VisionTransformer(nn.Module):
    """Fine-tune encoder; `return_feat_map=True` yields [B, N, C]."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 4
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    use_mean_pooling: bool = True
    return_feat_map: bool = True
    num_classes: int = 0
    use_seq_cls_token: bool = False  # per-position class queries (:249-255)
    max_seq_len: int = 25
    num_mem_slots: int = 0  # frozen memory-bank tokens (:263-269)
    use_mem_in_decoder: bool = False
    remat: bool = False  # rematerialize each block in the backward pass
    dtype: jnp.dtype = jnp.float32

    @property
    def patch_shape(self):
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self):
        gh, gw = self.patch_shape
        return gh * gw

    @property
    def num_features(self):
        return self.embed_dim

    def get_num_layers(self):
        return self.depth

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, n, c = x.shape

        if self.num_mem_slots > 0:
            # frozen random memory slots appended to the token map (:325-326)
            mem = self.param("mem_bank", trunc_normal_init,
                             (1, self.num_mem_slots, c), jnp.float32)
            mem = jax.lax.stop_gradient(jnp.asarray(mem, x.dtype))
            x = jnp.concatenate([x, jnp.broadcast_to(mem, (b, self.num_mem_slots, c))], 1)
            n = n + self.num_mem_slots

        if self.use_learnable_pos_emb:
            pos = self.param("pos_embed", trunc_normal_init, (1, n, c), jnp.float32)
        else:
            pos = sinusoid_position_table(n, c)
        x = x + jnp.asarray(pos, dtype=x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        n_cls = 0
        if self.use_seq_cls_token:
            # max_seq_len learned class queries with their own sinusoid
            # positions and token-type embeddings (:335-342)
            cls_tok = self.param("cls_token", trunc_normal_init,
                                 (1, self.max_seq_len, c), jnp.float32)
            cls_type = self.param("cls_type_emb", trunc_normal_init, (1, 1, c), jnp.float32)
            vis_type = self.param("vis_type_emb", trunc_normal_init, (1, 1, c), jnp.float32)
            cls = jnp.asarray(cls_tok, x.dtype) + jnp.asarray(
                sinusoid_position_table(self.max_seq_len, c), x.dtype
            ) + jnp.asarray(cls_type, x.dtype)
            cls = nn.Dropout(self.drop_rate)(
                jnp.broadcast_to(cls, (b, self.max_seq_len, c)),
                deterministic=deterministic,
            )
            x = x + jnp.asarray(vis_type, x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
            n_cls = self.max_seq_len

        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        # memory knob, off by default: recomputing blocks in the backward
        # costs ~20% step time on v5e at ViT-S/batch-128 but is what lets
        # ViT-base-and-up or very large batches fit in HBM
        block_cls = (nn.remat(Block, static_argnums=(3,))
                     if self.remat else Block)
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                init_values=self.init_values,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, None, deterministic)

        if self.num_mem_slots > 0 and not self.use_mem_in_decoder:
            x = x[:, : x.shape[1] - self.num_mem_slots]
        if self.use_seq_cls_token:
            return x[:, :n_cls]

        if self.return_feat_map:
            # norm is Identity when mean pooling is configured
            # (modeling_finetune.py:280); the feature-map path returns the
            # un-normalized token map (:354-355).
            if not self.use_mean_pooling:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            return x
        if self.use_mean_pooling:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fc_norm")(x.mean(axis=1))
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)[:, 0]
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


class PretrainViTEncoder(nn.Module):
    """SimMIM-style encoder: all tokens kept, masked positions replaced by
    a learned mask token *before* adding position embeddings
    (reference: modeling_pretrain_vit.py:89-106)."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 4
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    use_final_norm: bool = True  # MoCo_ViT replaces the last LN with Identity
    remat: bool = False  # rematerialize each block in the backward pass
    dtype: jnp.dtype = jnp.float32

    @property
    def patch_shape(self):
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self):
        gh, gw = self.patch_shape
        return gh * gw

    @property
    def num_features(self):
        return self.embed_dim

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        x = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, n, c = x.shape

        mask_token = self.param("mask_token", nn.initializers.zeros, (1, 1, c), jnp.float32)
        if mask is not None:
            m = mask.astype(x.dtype)[..., None]  # [B, N, 1]
            x = x * (1.0 - m) + jnp.asarray(mask_token, x.dtype) * m

        if self.use_learnable_pos_emb:
            pos = self.param("pos_embed", trunc_normal_init, (1, n, c), jnp.float32)
        else:
            pos = sinusoid_position_table(n, c)
        x = x + jnp.asarray(pos, dtype=x.dtype)

        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        # memory knob, off by default (see VisionTransformer)
        block_cls = (nn.remat(Block, static_argnums=(3,))
                     if self.remat else Block)
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                init_values=self.init_values,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, None, deterministic)
        if self.use_final_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x


_WIDTHS = {"micro": (64, 2), "tiny": (192, 3), "small": (384, 6), "base": (512, 8)}
_DEPTHS = {"micro": 2}


def _vit(size, **kwargs):
    dim, heads = _WIDTHS[size]
    defaults = dict(
        img_size=(32, 128), patch_size=4, embed_dim=dim, depth=_DEPTHS.get(size, 12),
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
    )
    defaults.update(kwargs)
    return VisionTransformer(**defaults)


def _simmim_vit(size, **kwargs):
    dim, heads = _WIDTHS[size]
    defaults = dict(
        img_size=(32, 128), patch_size=4, embed_dim=dim, depth=_DEPTHS.get(size, 12),
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
    )
    defaults.update(kwargs)
    return PretrainViTEncoder(**defaults)


@register_model(name="vit_micro_patch4_32x128")
def vit_micro_patch4_32x128(**kw):
    """2-layer, 64-dim test/smoke model (not in the reference registry)."""
    return _vit("micro", **kw)


@register_model(name="simmim_vit_micro_patch4_32x128")
def simmim_vit_micro_patch4_32x128(**kw):
    return _simmim_vit("micro", **kw)


@register_model(name="vit_tiny_patch4_32x128")
def vit_tiny_patch4_32x128(**kw):
    return _vit("tiny", **kw)


@register_model(name="vit_small_patch4_32x128")
def vit_small_patch4_32x128(**kw):
    return _vit("small", **kw)


@register_model(name="vit_base_patch4_32x128")
def vit_base_patch4_32x128(**kw):
    return _vit("base", **kw)


@register_model(name="vit_satrn_patch4_32x128")
def vit_satrn_patch4_32x128(**kw):
    # reference: modeling_finetune.py:429-435 (512-wide, 8 heads)
    return _vit("base", **kw)


@register_model(name="vit_seq_cls_satrn_patch4_32x128")
def vit_seq_cls_satrn_patch4_32x128(**kw):
    # reference: modeling_finetune.py:437-443
    kw.setdefault("use_seq_cls_token", True)
    kw.setdefault("max_seq_len", 25)
    return _vit("base", **kw)


@register_model(name="vit_seq_cls_base_patch4_32x128")
def vit_seq_cls_base_patch4_32x128(**kw):
    # reference: modeling_finetune.py:445-451 (768-wide, 12 heads)
    kw.setdefault("use_seq_cls_token", True)
    kw.setdefault("max_seq_len", 25)
    defaults = dict(img_size=(32, 128), patch_size=4, embed_dim=768, depth=12,
                    num_heads=12, mlp_ratio=4.0, qkv_bias=True)
    defaults.update(kw)
    return VisionTransformer(**defaults)


@register_model(name="simmim_vit_tiny_patch4_32x128")
def simmim_vit_tiny_patch4_32x128(**kw):
    return _simmim_vit("tiny", **kw)


@register_model(name="simmim_vit_small_patch4_32x128")
def simmim_vit_small_patch4_32x128(**kw):
    return _simmim_vit("small", **kw)


@register_model(name="simmim_vit_base_patch4_32x128")
def simmim_vit_base_patch4_32x128(**kw):
    return _simmim_vit("base", **kw)
