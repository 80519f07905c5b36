"""On-TPU Pallas kernel assertions: `_pallas_attention` forward and VJP
checked on the REAL chip, for the shapes the models use
(ViT-small/base 256-token self-attention), fp32 and bf16.

The pytest suite runs the same kernels only through the interpreter on CPU
(tests/test_pallas_kernels.py); this script is the real-hardware check the
verify recipe runs (reference hot path being replaced:
modeling_finetune.py:87-125).

Usage (from repo root, real TPU backend):

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/check_tpu_kernels.py

Exits 0 with one PASS line per case; nonzero with the offending deltas.

Anchors and tolerances (measured on v5e, 2026-08):
* fp32 is anchored against an fp64 numpy ground truth, NOT against
  `_ref_attention`: on TPU both the Pallas dots and XLA's default-precision
  fp32 einsums run bf16 multiplies on the MXU (the fp32-ish default, ≙
  tf32 on the A100s the reference ran on), so each lands ~4e-3 from truth
  with different accumulation order (measured: pallas 3.9e-3, XLA default
  3.8e-3, XLA precision='highest' 8e-7).  Asserted: fwd <= 1.5e-2, grads
  <= 3e-2 max-abs vs fp64 truth for BOTH paths.
* bf16: pallas vs `_ref_attention` run in bf16 — fwd <= 2e-2, grads
  <= 5e-2; the delta is one bf16 rounding of the attention weights
  (`e.astype(v.dtype)`), amplified once in the VJP.
* bf16 + BF16_EXP=1 tile: same bounds (the docstring claim in
  ops/attention.py:39-46, asserted here on hardware).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops import attention


def _truth_fwd_bwd(q, k, v, g, scale):
    """fp64 numpy attention forward + VJP of vdot(out, g)."""
    q, k, v, g = (a.astype(np.float64) for a in (q, k, v, g))
    s = np.einsum("bqhd,bkhd->bhqk", q * scale, k)
    w = np.exp(s - s.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", w, v)
    gh = np.einsum("bqhd->bhqd", g)
    dv = np.einsum("bhqk,bhqd->bkhd", w, gh)
    dw = np.einsum("bhqd,bkhd->bhqk", gh, v)
    ds = w * (dw - np.sum(dw * w, -1, keepdims=True))
    dq = scale * np.einsum("bhqk,bkhd->bqhd", ds, k)
    dk = scale * np.einsum("bhqk,bqhd->bkhd", ds, q)
    return out, (dq, dk, dv)


def _max_delta(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) -
                               np.asarray(b, np.float64))))


def check(name, b, l, h, d, dtype, fwd_tol, grad_tol, bf16_exp=False):
    if jax.default_backend() != "tpu":
        raise SystemExit("check_tpu_kernels needs the real TPU backend "
                         f"(got {jax.default_backend()})")
    rng = np.random.default_rng(0)
    scale = d ** -0.5
    qn = rng.normal(size=(b, l, h, d)).astype(np.float32)
    kn = rng.normal(size=(b, l, h, d)).astype(np.float32)
    vn = rng.normal(size=(b, l, h, d)).astype(np.float32)
    gn = rng.normal(size=(b, l, h, d)).astype(np.float32)
    q, k, v, g = (jnp.asarray(a, dtype) for a in (qn, kn, vn, gn))

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
        grads_p = jax.jit(jax.grad(pallas_loss, argnums=(0, 1, 2)))(q, k, v)
        grads_r = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    finally:
        attention.BF16_EXP = old

    if dtype == jnp.float32:
        # anchor BOTH paths against fp64 truth (see module docstring: on
        # the MXU default-precision fp32 ≈ tf32, so pallas-vs-ref is the
        # wrong comparison — each is ~4e-3 from truth independently)
        t_out, t_grads = _truth_fwd_bwd(qn, kn, vn, gn, scale)
        fwd_delta = max(_max_delta(out_p, t_out), _max_delta(out_r, t_out))
        grad_delta = max(
            max(_max_delta(a, t) for a, t in zip(grads_p, t_grads)),
            max(_max_delta(a, t) for a, t in zip(grads_r, t_grads)))
    else:
        fwd_delta = _max_delta(out_p, out_r)
        grad_delta = max(
            _max_delta(a, b_) for a, b_ in zip(grads_p, grads_r))

    ok = fwd_delta <= fwd_tol and grad_delta <= grad_tol
    status = "PASS" if ok else "FAIL"
    print(f"{status} {name}: fwd_delta={fwd_delta:.3e} (tol {fwd_tol}) "
          f"grad_delta={grad_delta:.3e} (tol {grad_tol})", flush=True)
    return ok


def main():
    cases = [
        # (name, B, L, H, D, dtype, fwd_tol, grad_tol, bf16_exp)
        ("vit_small_fp32", 8, 256, 6, 64, jnp.float32, 1.5e-2, 3e-2, False),
        ("vit_small_bf16", 8, 256, 6, 64, jnp.bfloat16, 2e-2, 5e-2, False),
        ("vit_base_bf16", 4, 256, 8, 64, jnp.bfloat16, 2e-2, 5e-2, False),
        ("vit_small_bf16_exp", 8, 256, 6, 64, jnp.bfloat16, 2e-2, 5e-2, True),
    ]
    results = [check(*c) for c in cases]  # run ALL cases (no short-circuit)
    if not all(results):
        raise SystemExit(1)
    print("all TPU kernel checks passed")


if __name__ == "__main__":
    main()
