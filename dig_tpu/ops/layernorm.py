"""Fused LayerNorm for TPU (Pallas, custom VJP).

XLA lowers LayerNorm as separate statistic-reduction fusions that
materialize fp32 [rows] mean/var tensors through HBM — measured at ~17%
of the DiG pre-training step.  This kernel computes stats, normalization
and the affine transform in one VMEM pass per row block; the backward
recomputes the (cheap) statistics instead of saving them and emits
per-block partial reductions for dgamma/dbeta that are summed outside.

Semantics match `flax.linen.LayerNorm` (fp32 statistics, biased variance,
eps inside the rsqrt).  Used by `dig_tpu.models.layers` when the feature
dim is lane-aligned; plain jnp fallback otherwise/on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# test hook: run kernels in the Pallas interpreter (works on CPU)
INTERPRET = False

_ROW_BLOCK = 512


def _ln_ref(x, gamma, beta, eps):
    acc = jnp.promote_types(x.dtype, jnp.float32)  # never downcast f64
    xf = x.astype(acc)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(acc) + beta.astype(acc)).astype(x.dtype)


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _ln_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)
    # partial param grads: row 0 carries the block sum, rows 1..7 are
    # zero padding (TPU blocks need >= 8 sublanes)
    pad = jnp.zeros((7, c), jnp.float32)
    dg_ref[0] = jnp.concatenate([jnp.sum(dy * xhat, axis=0)[None], pad], axis=0)
    db_ref[0] = jnp.concatenate([jnp.sum(dy, axis=0)[None], pad], axis=0)


def _rows(x):
    c = x.shape[-1]
    return x.reshape(-1, c), x.shape


def _pallas_ln_fwd_impl(x, gamma, beta, eps):
    x2, shape = _rows(x)
    r, c = x2.shape
    rb = min(_ROW_BLOCK, r)
    grid = (r // rb,)
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
    )(x2, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_ln(x, gamma, beta, eps):
    return _pallas_ln_fwd_impl(x, gamma, beta, eps)


def _pallas_ln_vjp_fwd(x, gamma, beta, eps):
    return _pallas_ln_fwd_impl(x, gamma, beta, eps), (x, gamma)


def _pallas_ln_vjp_bwd(eps, res, g):
    x, gamma = res
    x2, shape = _rows(x)
    g2, _ = _rows(g)
    r, c = x2.shape
    rb = min(_ROW_BLOCK, r)
    nblocks = r // rb
    dx, dg_part, db_part = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(nblocks,),
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, 8, c), jnp.float32),
        ),
    )(x2, gamma.reshape(1, c), g2)
    dgamma = jnp.sum(dg_part, axis=(0, 1)).astype(gamma.dtype)
    dbeta = jnp.sum(db_part, axis=(0, 1)).astype(gamma.dtype)
    return dx.reshape(shape), dgamma, dbeta


_pallas_ln.defvjp(_pallas_ln_vjp_fwd, _pallas_ln_vjp_bwd)


def _use_pallas_ln(x) -> bool:
    if os.environ.get("DIG_TPU_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    rows = x.size // c
    return c % 128 == 0 and rows >= _ROW_BLOCK and rows % min(_ROW_BLOCK, rows) == 0


def layer_norm(x, gamma, beta, eps: float = 1e-6):
    """Fused LayerNorm over the last axis; falls back to plain jnp when the
    shape doesn't fit the kernel."""
    if _use_pallas_ln(x):
        return _pallas_ln(x, gamma, beta, eps)
    return _ln_ref(x, gamma, beta, eps)
