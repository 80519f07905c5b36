"""Dense layer whose backward computes the bias gradient with a Pallas
column-sum kernel.

Motivation (ROOFLINE.md op budget): XLA lowers the fc1 bias gradient —
``sum(dy, axis=0)`` over 65 536 rows — to a cross-sublane VPU reduce that
runs at ~160 GB/s, 12 x 0.65 ms per pre-training step.  A trivial Pallas
kernel that streams row blocks through VMEM and accumulates a [1, C]
partial per grid step reads the same bytes at DMA speed instead.  The
matmul gradients are untouched (XLA already runs them at ~88 % of MXU
peak).

Env gate: ``DIG_TPU_FUSED_BIAS_GRAD=1`` enables; **default OFF** — the
in-model A/B on v5e measured 912.8 vs 940.9 imgs/s (−3 %): the
``custom_vjp`` boundary stops XLA from fusing the bias reduce into the
surrounding backward fusion (bwd+opt 71.8 → 77.7 ms), which costs more
than the faster standalone reduce saves.  Kept as a documented
experiment (ROOFLINE.md "What was tried"); the kernel itself is correct
and interpreter-tested.
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# test hook: run the kernel in the Pallas interpreter (works on CPU)
INTERPRET = False

_BLOCK_ROWS = 512


def _colsum_kernel(x_ref, o_ref, *, n_rows: int, block_rows: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    if n_rows % block_rows:
        # boundary block: rows past n_rows are padding garbage
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * block_rows
        x = jnp.where(rows < n_rows, x, 0.0)
    part = jnp.sum(x, axis=0, keepdims=True)  # [1, C]

    @pl.when(i == 0)
    def _init():
        o_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        o_ref[...] += part


def column_sum(x) -> jax.Array:
    """``sum(x, axis=0)`` for a 2-D array via a row-streaming Pallas
    kernel (fp32 accumulation); jnp fallback off-TPU."""
    n, c = x.shape
    if not (INTERPRET or jax.default_backend() == "tpu") or n < 2 * _BLOCK_ROWS:
        return jnp.sum(x.astype(jnp.float32), axis=0)
    bn = _BLOCK_ROWS
    grid = (n + bn - 1) // bn
    out = pl.pallas_call(
        functools.partial(_colsum_kernel, n_rows=n, block_rows=bn),
        grid=(grid,),
        in_specs=[pl.BlockSpec((bn, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
        interpret=INTERPRET,
    )(x)
    return out[0]


@jax.custom_vjp
def _dense_fused(x, kernel, bias):
    return jnp.dot(x, kernel) + bias


def _dense_fused_fwd(x, kernel, bias):
    return _dense_fused(x, kernel, bias), (x, kernel)


def _dense_fused_bwd(res, dy):
    x, kernel = res
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, dy.shape[-1])
    dx = jnp.dot(dy, kernel.T).astype(x.dtype)
    dk = jnp.dot(x2.T, dy2).astype(kernel.dtype)
    db = column_sum(dy2).astype(dy.dtype)
    return dx, dk, db


_dense_fused.defvjp(_dense_fused_fwd, _dense_fused_bwd)


def fused_bias_grad_enabled() -> bool:
    return os.environ.get("DIG_TPU_FUSED_BIAS_GRAD", "0") == "1"


class FusedBiasGradDense(nn.Module):
    """Drop-in for ``nn.Dense`` (same param tree: kernel/bias in fp32,
    compute in `dtype`) with the Pallas bias-grad backward."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return _dense_fused(jnp.asarray(x, self.dtype),
                            jnp.asarray(kernel, self.dtype),
                            jnp.asarray(bias, self.dtype))
