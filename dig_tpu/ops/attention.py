"""Fused multi-head attention for TPU.

The reference computes attention as unfused matmul/softmax/matmul torch ops
(reference: modeling_finetune.py:87-125).  Here the hot path is a Pallas
kernel that keeps the whole (seq x seq) score tile in VMEM — the model's
sequences are short (256 visual tokens, <=26 text tokens) so one block per
(batch, head) covers the full sequence and the kernel is a single
MXU->VPU->MXU pipeline with no HBM round-trip for the scores.

A jnp fallback with identical semantics is used for CPU tests, tiny
shapes, and whenever a bias/mask layout is not supported by the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels only run on TPU backends.
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _ref_attention(q, k, v, mask, scale):
    """[B, H, Lq, D] x [B, H, Lk, D] reference attention in fp32 softmax."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = jax.nn.softmax(logits, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    """Fused backward for one (batch*head) slice: recompute the softmax in
    VMEM (flash-attention style; cheaper than storing the [Lq, Lk] weights
    to HBM) and produce dq/dk/dv with four MXU matmuls."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1)  # [Lq, Lk] fp32
    wt = w.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(
        wt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dw = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq_ref[0] = (
        jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)


def _pallas_attention_fwd_impl(q, k, v, scale):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk, d)
    vf = v.reshape(bh, lk, d)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * lq * lk * d * 2,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, lq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention(q, k, v, scale):
    return _pallas_attention_fwd_impl(q, k, v, scale)


def _pallas_attention_fwd(q, k, v, scale):
    return _pallas_attention_fwd_impl(q, k, v, scale), (q, k, v)


def _pallas_attention_bwd(scale, res, g):
    q, k, v = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    spec_q = pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * lq * lk * d,
            bytes_accessed=4 * bh * lq * d * q.dtype.itemsize,
            transcendentals=bh * lq * lk,
        ),
    )(
        q.reshape(bh, lq, d), k.reshape(bh, lk, d), v.reshape(bh, lk, d),
        g.reshape(bh, lq, d),
    )
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def _use_pallas(q, k, mask) -> bool:
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    _, _, lq, d = q.shape
    lk = k.shape[2]
    # One (lq, lk) fp32 score tile + q/k/v/o must fit comfortably in VMEM.
    if d % 128 != 0 and d not in (32, 64):
        return False
    return lq * lk * 4 + 4 * max(lq, lk) * d * 4 < 8 * 1024 * 1024


def multi_head_attention(q, k, v, mask=None, scale=None):
    """Batched MHA core: inputs [B, H, L, D]; optional boolean mask
    broadcastable to [B, H, Lq, Lk] (True = attend)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_pallas(q, k, mask):
        return _pallas_attention(q, k, v, scale)
    return _ref_attention(q, k, v, mask, scale)
