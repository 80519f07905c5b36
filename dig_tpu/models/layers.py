"""Shared transformer building blocks (Flax).

Behavioral parity targets in the reference:

* `Attention` with the fused-qkv q/v-bias trick — a single qkv projection
  whose bias is [q_bias, zeros, v_bias] with the k-bias frozen at zero
  (modeling_finetune.py:63-125),
* pre-LN `Block` with optional layerscale gamma_1/2 and DropPath
  (modeling_finetune.py:128-170),
* `Mlp` (modeling_finetune.py:43-60), `PatchEmbed` conv projection
  (modeling_finetune.py:173-196) — implemented as a reshape + matmul,
  which XLA maps onto the MXU more directly than a strided conv for
  non-overlapping patches,
* fixed sinusoid position table (modeling_finetune.py:200-210).

TPU-first conventions: parameters live in fp32, activations are computed
in a configurable `dtype` (bf16 by default on TPU), attention runs through
the fused Pallas path in `dig_tpu.ops.attention`.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops.activations import gelu
from dig_tpu.ops.attention import multi_head_attention, multi_head_attention_packed
from dig_tpu.ops.layernorm import layer_norm as fused_layer_norm

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
xavier_uniform_init = nn.initializers.xavier_uniform()


def sinusoid_position_table(n_position: int, dim: int) -> np.ndarray:
    """[1, n_position, dim] fixed sin/cos table (not a parameter)."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / dim)
    table = np.zeros((n_position, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth: drop the whole residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class FusedLayerNorm(nn.Module):
    """Drop-in LayerNorm backed by the fused Pallas kernel on TPU.
    Parameter names (scale/bias) match `flax.linen.LayerNorm`, so
    checkpoints are interchangeable."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return fused_layer_norm(x, scale, bias, self.epsilon).astype(self.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from dig_tpu.ops.fused_dense import FusedBiasGradDense, fused_bias_grad_enabled

        out_dim = self.out_dim or x.shape[-1]
        if fused_bias_grad_enabled():
            # fc1's bias grad is a 65k-row column reduce that XLA runs on
            # the VPU at ~160 GB/s; the Pallas-backward dense streams it
            # at DMA speed (ops/fused_dense.py; param tree unchanged)
            x = FusedBiasGradDense(self.hidden_dim, dtype=self.dtype,
                                   kernel_init=trunc_normal_init,
                                   name="Dense_0")(x)
        else:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name="Dense_0")(x)
        x = gelu(x)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="Dense_1")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Self-attention with the reference's q/v-bias parameterization.

    `qkv_bias=True` creates trainable q_bias and v_bias but a constant
    zero k-bias, matching modeling_finetune.py:75-91 exactly (the k-bias
    is mathematically irrelevant to softmax yet affects checkpoints).
    """

    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = self.attn_head_dim or c // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv_kernel = self.param(
            "qkv_kernel", trunc_normal_init, (c, 3 * all_head_dim), jnp.float32
        )
        qkv = jnp.dot(x, qkv_kernel.astype(self.dtype))
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,), jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(self.dtype)
        # contiguous column slices of the fused projection — zero-copy
        # (the packed q|k|v layout matches the reference's fused qkv weight)
        q = qkv[:, :, :all_head_dim]
        k = qkv[:, :, all_head_dim : 2 * all_head_dim]
        v = qkv[:, :, 2 * all_head_dim :]

        if mask is not None and mask.ndim == 2:
            mask = mask[:, None, None, :]
        elif mask is not None and mask.ndim == 3:
            mask = mask[:, None, :, :]

        drop_attn = self.attn_drop > 0.0 and not deterministic
        if drop_attn:
            # Dropout on attention weights forces the unfused path.
            qh = q.reshape(b, n, self.num_heads, head_dim)
            kh = k.reshape(b, n, self.num_heads, head_dim)
            vh = v.reshape(b, n, self.num_heads, head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh).astype(jnp.float32)
            if mask is not None:
                logits = jnp.where(mask, logits, -1e30)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            weights = nn.Dropout(self.attn_drop)(weights, deterministic=False)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(b, n, all_head_dim)
        else:
            out = multi_head_attention_packed(
                q, k, v, self.num_heads, mask=mask, scale=scale
            )
        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-LN transformer block with optional layerscale and droppath
    (modeling_finetune.py:128-170)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    attn_head_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = x.shape[-1]
        attn_out = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
            name="attn",
        )(FusedLayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x), mask, deterministic)
        mlp_in = FusedLayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")
        if self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (dim,), jnp.float32
            )
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (dim,), jnp.float32
            )
            attn_out = gamma_1.astype(self.dtype) * attn_out
        x = x + self._drop_path(attn_out, deterministic)
        mlp_out = Mlp(
            hidden_dim=int(dim * self.mlp_ratio), dropout=self.drop, dtype=self.dtype, name="mlp"
        )(mlp_in(x), deterministic)
        if self.init_values > 0:
            mlp_out = gamma_2.astype(self.dtype) * mlp_out
        x = x + self._drop_path(mlp_out, deterministic)
        return x

    def _drop_path(self, x, deterministic):
        if self.drop_path_rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.drop_path_rate, deterministic, self.make_rng("dropout"))


class CrossBlock(nn.Module):
    """Pre-LN block whose attention takes external k/v (used by the window
    patch extractor; reference: modeling_pretrain_moco_mim_ori.py:21-135).
    Note the reference normalizes q, k and v with the *same* norm1."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, kv=None, deterministic: bool = True):
        dim = x.shape[-1]
        norm1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")
        xq = norm1(x)
        kv_n = xq if kv is None else norm1(kv)
        b, lq, _ = xq.shape
        lk = kv_n.shape[1]
        head_dim = dim // self.num_heads

        def proj(name, inp, bias_trainable):
            kernel = self.param(f"{name}_kernel", xavier_uniform_init, (dim, dim), jnp.float32)
            y = jnp.dot(inp, kernel.astype(self.dtype))
            if self.qkv_bias and bias_trainable:
                bias = self.param(f"{name}_bias", nn.initializers.zeros, (dim,), jnp.float32)
                y = y + bias.astype(self.dtype)
            return y

        q = proj("q", xq, True).reshape(b, lq, self.num_heads, head_dim)
        # k-bias frozen at zero in the reference (modeling_pretrain_moco_mim_ori.py:38)
        k = proj("k", kv_n, False).reshape(b, lk, self.num_heads, head_dim)
        v = proj("v", kv_n, True).reshape(b, lk, self.num_heads, head_dim)

        attn = multi_head_attention(q, k, v)
        attn = attn.reshape(b, lq, dim)
        attn = nn.Dense(dim, dtype=self.dtype, kernel_init=xavier_uniform_init, name="proj")(attn)
        # The reference's residual adds onto the *normalized* q (its Block
        # overwrites x with norm1(x) before the residual sum).
        x = xq + attn
        x = x + Mlp(hidden_dim=int(dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x), deterministic
        )
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + dense (MXU-friendly).

    Equivalent to the reference's stride-p conv (modeling_finetune.py:188)
    because patches do not overlap.  Input is NHWC.
    """

    img_size: tuple = (32, 128)
    patch_size: int = 4
    embed_dim: int = 384
    dtype: Dtype = jnp.float32

    @property
    def patch_shape(self):
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self):
        gh, gw = self.patch_shape
        return gh * gw

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert (h, w) == tuple(self.img_size), (
            f"Input image size ({h}*{w}) doesn't match model "
            f"({self.img_size[0]}*{self.img_size[1]})."
        )
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            kernel_init=xavier_uniform_init,
            name="proj",
        )(x)
        return x


def make_causal_mask(length: int) -> jnp.ndarray:
    """[1, L, L] boolean lower-triangular mask (True = attend);
    reference: models/transformer_layer.py:451-457."""
    return jnp.tril(jnp.ones((length, length), dtype=bool))[None]


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, 1, L] boolean mask, True where position < length
    (reference: models/transformer_layer.py:438-448)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None])[:, None, :]
