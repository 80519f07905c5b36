import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.registry import create_model, list_models
from dig_tpu.models.vit import PretrainViTEncoder, VisionTransformer


def tiny_vit(**kw):
    defaults = dict(img_size=(32, 128), patch_size=4, embed_dim=32, depth=2, num_heads=2,
                    qkv_bias=True)
    defaults.update(kw)
    return VisionTransformer(**defaults)


def test_vit_feature_map_shape():
    m = tiny_vit()
    x = jnp.zeros((2, 32, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 256, 32)


@pytest.mark.slow
def test_pretrain_encoder_mask_token_substitution():
    m = PretrainViTEncoder(img_size=(32, 128), patch_size=4, embed_dim=32, depth=1,
                           num_heads=2, qkv_bias=True)
    x = jnp.ones((1, 32, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    mask = jnp.zeros((1, 256), bool).at[:, :128].set(True)
    y_masked = m.apply(v, x, mask)
    y_plain = m.apply(v, x)
    assert y_masked.shape == (1, 256, 32)
    assert not np.allclose(np.asarray(y_masked), np.asarray(y_plain))


def test_qv_bias_has_no_k_bias():
    m = tiny_vit(depth=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))
    attn = v["params"]["blocks_0"]["attn"]
    assert "q_bias" in attn and "v_bias" in attn and "k_bias" not in attn


def test_registry_names():
    names = list_models()
    for n in [
        "vit_tiny_patch4_32x128", "vit_small_patch4_32x128", "vit_base_patch4_32x128",
        "simmim_vit_small_patch4_32x128", "vit_satrn_patch4_32x128",
    ]:
        assert n in names


def test_registry_dims():
    m = create_model("vit_small_patch4_32x128")
    assert m.embed_dim == 384 and m.num_heads == 6 and m.depth == 12
    m = create_model("vit_satrn_patch4_32x128")
    assert m.embed_dim == 512 and m.num_heads == 8
