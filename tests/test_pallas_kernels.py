"""Pallas kernel correctness on CPU via the interpreter.

The fused attention and LayerNorm kernels normally only execute on TPU;
these tests run them through `pallas_call(interpret=True)` against the
jnp reference implementations so kernel regressions are caught in CI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dig_tpu.ops.attention as attn_mod
import dig_tpu.ops.layernorm as ln_mod


@pytest.fixture(autouse=True)
def interpret_mode():
    attn_mod.INTERPRET = True
    ln_mod.INTERPRET = True
    yield
    attn_mod.INTERPRET = False
    ln_mod.INTERPRET = False


def test_attention_kernel_interpreted():
    B, L, H, D = 2, 128, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D))
    scale = D**-0.5
    out_k = attn_mod._pallas_attention(q, k, v, scale)
    out_r = attn_mod._ref_attention(q, k, v, None, scale)
    assert np.allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-5)


@pytest.mark.slow
def test_attention_kernel_grads_interpreted():
    B, L, H, D = 1, 128, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D))
    scale = D**-0.5

    gk = jax.grad(lambda q, k, v: jnp.sum(attn_mod._pallas_attention(q, k, v, scale) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(attn_mod._ref_attention(q, k, v, None, scale) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_layernorm_kernel_interpreted():
    x = jax.random.normal(jax.random.PRNGKey(0), (1024, 128))
    g = jax.random.normal(jax.random.PRNGKey(1), (128,)) + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    # force the kernel path regardless of backend
    y_k = ln_mod._pallas_ln(x, g, b, 1e-6)
    y_r = ln_mod._ln_ref(x, g, b, 1e-6)
    assert np.allclose(np.asarray(y_k), np.asarray(y_r), atol=2e-5)


@pytest.mark.slow
def test_layernorm_kernel_grads_interpreted():
    x = jax.random.normal(jax.random.PRNGKey(0), (1024, 128))
    g = jax.random.normal(jax.random.PRNGKey(1), (128,)) + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    gk = jax.grad(lambda x, g, b: jnp.sum(ln_mod._pallas_ln(x, g, b, 1e-6) ** 2),
                  argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(lambda x, g, b: jnp.sum(ln_mod._ln_ref(x, g, b, 1e-6) ** 2),
                  argnums=(0, 1, 2))(x, g, b)
    for a, c in zip(gk, gr):
        rel = np.abs(np.asarray(a) - np.asarray(c)).max() / (np.abs(np.asarray(c)).max() + 1e-9)
        assert rel < 1e-4, rel


def test_attention_kernel_bf16_exp_interpreted():
    """bf16-exponential + fused-denominator variant stays within bf16
    rounding of the fp32-tile kernel (the AV weights were already bf16 in
    the fp32 path, so the delta is one rounding of the exponent input)."""
    B, L, H, D = 2, 128, 2, 64
    q = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D)),
                    jnp.bfloat16)
    k = jnp.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D)),
                    jnp.bfloat16)
    v = jnp.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D)),
                    jnp.bfloat16)
    scale = D**-0.5
    old = attn_mod.BF16_EXP
    try:
        attn_mod.BF16_EXP = False
        out_f32tile = attn_mod._pallas_attention_fwd_impl(q, k, v, scale)
        attn_mod.BF16_EXP = True
        out_bf16 = attn_mod._pallas_attention_fwd_impl(q, k, v, scale)
    finally:
        attn_mod.BF16_EXP = old
    ref = attn_mod._ref_attention(q, k, v, None, scale)
    d_variant = np.abs(out_bf16.astype(np.float32) - out_f32tile.astype(np.float32)).max()
    d_ref = np.abs(out_bf16.astype(np.float32) - np.asarray(ref, np.float32)).max()
    assert d_variant <= 2e-2, d_variant
    assert d_ref <= 2e-2, d_ref


def test_colsum_kernel_interpreted():
    import dig_tpu.ops.fused_dense as fd

    old = fd.INTERPRET
    fd.INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        # odd row count exercises the boundary-block masking
        for n in (1100, 2048):
            x = jnp.asarray(rng.normal(size=(n, 384)).astype(np.float32))
            got = fd.column_sum(x)
            ref = jnp.sum(x, axis=0)
            assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
    finally:
        fd.INTERPRET = old


def test_fused_bias_grad_dense_matches_nn_dense(monkeypatch):
    """FusedBiasGradDense: same param tree and same value/grads as
    nn.Dense (the Pallas backward only changes HOW db is computed)."""
    import flax.linen as nn

    import dig_tpu.ops.fused_dense as fd
    from dig_tpu.models.layers import Mlp

    monkeypatch.setenv("DIG_TPU_FUSED_BIAS_GRAD", "1")
    fd.INTERPRET = True
    try:
        # 4*300 = 1200 flattened rows >= 2*_BLOCK_ROWS so the backward
        # actually routes through the Pallas column-sum kernel (a smaller
        # input silently takes the jnp fallback)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 300, 32))
        fused = Mlp(hidden_dim=64)
        v1 = fused.init(jax.random.PRNGKey(1), x)

        monkeypatch.setenv("DIG_TPU_FUSED_BIAS_GRAD", "0")
        plain = Mlp(hidden_dim=64)
        v2 = plain.init(jax.random.PRNGKey(1), x)
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)

        monkeypatch.setenv("DIG_TPU_FUSED_BIAS_GRAD", "1")
        y1, g1 = jax.value_and_grad(
            lambda p, x: jnp.sum(fused.apply(p, x) ** 2))(v1, x)
        monkeypatch.setenv("DIG_TPU_FUSED_BIAS_GRAD", "0")
        y2, g2 = jax.value_and_grad(
            lambda p, x: jnp.sum(plain.apply(p, x) ** 2))(v1, x)
        assert np.allclose(float(y1), float(y2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        fd.INTERPRET = False


def test_attention_lse_variant_interpreted():
    """DIG_TPU_ATTN_STORE_LSE kernel pair: fwd output and full VJP must
    match the plain kernel / jnp reference (the stored m/s equal the
    recomputed ones bit-for-bit, so this is an exact-path check)."""
    B, L, H, D = 2, 128, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D))
    scale = D**-0.5
    out_k = attn_mod._pallas_attention_lse(q, k, v, scale)
    out_r = attn_mod._ref_attention(q, k, v, None, scale)
    assert np.allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-5)

    gk = jax.grad(
        lambda q, k, v: jnp.sum(
            attn_mod._pallas_attention_lse(q, k, v, scale) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(
            attn_mod._ref_attention(q, k, v, None, scale) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)
