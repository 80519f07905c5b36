"""On-TPU Pallas kernel assertions: `_pallas_attention` forward and VJP
against `_ref_attention` on the REAL chip, for the shapes the models use
(ViT-small/base 256-token self-attention), fp32 and bf16.

The pytest suite runs the same kernels only through the interpreter on CPU
(tests/test_pallas_kernels.py); this script is the real-hardware check the
verify recipe runs (reference hot path being replaced:
modeling_finetune.py:87-125).

Usage (from repo root, real TPU backend):

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/check_tpu_kernels.py

Exits 0 with one PASS line per case; nonzero with the offending deltas.

Tolerances (documented, asserted below):
* fp32: forward <= 1e-4 max-abs, grads <= 1e-4 — both paths use an fp32
  softmax; differences are matmul accumulation order only.
* bf16: forward <= 2e-2, grads <= 5e-2 — one bf16 rounding of the
  attention weights (`e.astype(v.dtype)`), amplified once in the VJP.
* bf16 + BF16_EXP=1 tile: forward <= 2e-2 (the docstring claim in
  ops/attention.py:38-45, asserted here on hardware).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops import attention


def check(name, b, l, h, d, dtype, fwd_tol, grad_tol, bf16_exp=False):
    if jax.default_backend() != "tpu":
        raise SystemExit("check_tpu_kernels needs the real TPU backend "
                         f"(got {jax.default_backend()})")
    rng = np.random.default_rng(0)
    scale = d ** -0.5
    q = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype)
    g = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype)

    old = attention.BF16_EXP
    attention.BF16_EXP = bf16_exp
    try:
        def pallas_loss(q, k, v):
            return jnp.vdot(attention._pallas_attention(q, k, v, scale)
                            .astype(jnp.float32), g.astype(jnp.float32))

        def ref_loss(q, k, v):
            return jnp.vdot(attention._ref_attention(q, k, v, None, scale)
                            .astype(jnp.float32), g.astype(jnp.float32))

        out_p = jax.jit(attention._pallas_attention, static_argnums=3)(
            q, k, v, scale)
        out_r = jax.jit(attention._ref_attention, static_argnums=4)(
            q, k, v, None, scale)
        fwd_delta = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) -
                                          out_r.astype(jnp.float32))))

        grads_p = jax.jit(jax.grad(pallas_loss, argnums=(0, 1, 2)))(q, k, v)
        grads_r = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
        grad_delta = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b_.astype(jnp.float32))))
            for a, b_ in zip(grads_p, grads_r))
    finally:
        attention.BF16_EXP = old

    ok = fwd_delta <= fwd_tol and grad_delta <= grad_tol
    status = "PASS" if ok else "FAIL"
    print(f"{status} {name}: fwd_delta={fwd_delta:.3e} (tol {fwd_tol}) "
          f"grad_delta={grad_delta:.3e} (tol {grad_tol})")
    return ok


def main():
    cases = [
        # (name, B, L, H, D, dtype, fwd_tol, grad_tol, bf16_exp)
        ("vit_small_fp32", 8, 256, 6, 64, jnp.float32, 1e-4, 1e-4, False),
        ("vit_small_bf16", 8, 256, 6, 64, jnp.bfloat16, 2e-2, 5e-2, False),
        ("vit_base_bf16", 4, 256, 8, 64, jnp.bfloat16, 2e-2, 5e-2, False),
        ("vit_small_bf16_exp", 8, 256, 6, 64, jnp.bfloat16, 2e-2, 5e-2, True),
    ]
    ok = all(check(*c) for c in cases)
    if not ok:
        raise SystemExit(1)
    print("all TPU kernel checks passed")


if __name__ == "__main__":
    main()
