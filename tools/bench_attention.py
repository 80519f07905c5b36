#!/usr/bin/env python
"""Micro-benchmark of the fused attention kernel variants on the local
accelerator.  Times fwd and fwd+bwd of the ViT-S pretrain geometry
(B=256 rows x 6 heads x 256 tokens x 64 head-dim, bf16) for:

  * xla    — the jnp reference path (DIG_TPU_NO_PALLAS semantics)
  * pallas — the fp32-score-tile Pallas kernel
  * bf16   — the bf16-exponential + fused-denominator variant

Memoization-safe over the axon relay (see tests and MEMORY): a drifting
scalar is chained through every call inside one jitted program, and a
host scalar fetch is the completion barrier.

CAVEAT (measured round 3): even with the fori_loop amortization this
standalone harness reads ~2.4 ms for a kernel the profiler attributes
0.66 ms in-model — isolated-kernel numbers over the relay are upper
bounds only.  Decide variants with an in-model `bench.py` A/B plus a
`jax.profiler` trace (see ROOFLINE.md), not with this tool alone.

Usage: python tools/bench_attention.py [batch_rows]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dig_tpu_xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(b=256, l=256, h=6, d=64, iters=12):
    from dig_tpu.ops import attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.bfloat16)
    scale = d ** -0.5

    n_loop = 20  # amortize the ~30 ms per-call relay floor over an
    # in-program fori_loop; per-iteration time = call time / n_loop

    def make_fns(impl):
        def core(q, k, v):
            if impl == "xla":
                return attention._ref_attention(q, k, v, None, scale)
            if impl == "lse":
                return attention._pallas_attention_lse(q, k, v, scale)
            if impl == "splash":
                return _splash_core(q, k, v, scale, l, h, d)
            return attention._pallas_attention(q, k, v, scale)

        def fwd_once(s, q, k, v):
            o = core(q + s.astype(q.dtype) * 1e-20, k, v)
            return s + 1e-6 + o.ravel()[0].astype(jnp.float32) * 1e-20

        def fwdbwd_once(s, q, k, v):
            def loss(q, k, v):
                o = core(q, k, v)
                return (o.astype(jnp.float32) ** 2).mean()

            g = jax.grad(loss, argnums=(0, 1, 2))(
                q + s.astype(q.dtype) * 1e-20, k, v)
            return s + 1e-6 + g[0].ravel()[0].astype(jnp.float32) * 1e-20

        def looped(once):
            @jax.jit
            def fn(q, k, v, s):
                return jax.lax.fori_loop(
                    0, n_loop, lambda i, s: once(s, q, k, v), s)

            return fn

        return looped(fwd_once), looped(fwdbwd_once)

    def timeit(fn):
        s = jnp.float32(0.0)
        s = fn(q, k, v, s)
        float(s)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            s = fn(q, k, v, s)
            float(s)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / n_loop * 1e3

    results = {}
    cases = [("xla", None, 0), ("pallas", False, 0), ("bf16", True, 0),
             ("lse", False, 0), ("splash", False, 0)]
    # bwd block-size sweep (DIG_TPU_ATTN_BWD_ROWS, read at trace time)
    for r in (1, 2, 4):
        cases.append((f"bwd_rows{r}", False, r))
    for impl, flip, bwd_rows in cases:
        if flip is not None:
            attention.BF16_EXP = flip
        os.environ["DIG_TPU_ATTN_BWD_ROWS"] = str(bwd_rows)
        name = impl if not impl.startswith("bwd_rows") else "pallas"
        try:
            fwd, fwdbwd = make_fns(name if impl.startswith("bwd") else impl)
            results[impl] = (timeit(fwd), timeit(fwdbwd))
            print(f"{impl:9s} fwd {results[impl][0]:7.2f} ms   "
                  f"fwd+bwd {results[impl][1]:7.2f} ms", flush=True)
        except Exception as e:  # record incompatibilities as data
            results[impl] = None
            print(f"{impl:9s} FAILED: {type(e).__name__}: {e}", flush=True)
    os.environ.pop("DIG_TPU_ATTN_BWD_ROWS", None)
    return results


def _splash_core(q, k, v, scale, l, h, d):
    """jax's splash-attention kernel on this geometry (full mask).  Splash
    wants [H, L, D] per example with head-major layout — the transposes are
    charged to the variant, as the model would pay them too."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
        splash_attention_mask as mask_lib,
    )

    mask = mask_lib.MultiHeadMask(
        [mask_lib.FullMask((l, l)) for _ in range(h)])
    kernel = splash.make_splash_mha(
        mask=mask, head_shards=1, q_seq_shards=1,
        block_sizes=splash.BlockSizes.get_default())
    qh = jnp.swapaxes(q, 1, 2) * scale  # splash applies no scale itself
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    out = jax.vmap(kernel)(qh, kh, vh)
    return jnp.swapaxes(out, 1, 2)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    run(b)
