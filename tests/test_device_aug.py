import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.data.device_aug import batched_affine_warp, device_augment


def test_identity_warp():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 128, 3)).astype(np.float32))
    eye = jnp.tile(jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])[None], (2, 1, 1))
    y = batched_affine_warp(x, eye)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_translate_warp():
    x = jnp.zeros((1, 8, 8, 1)).at[:, 2, 2].set(1.0)
    # output->input map: shift sampling by +1 in x => image moves left by 1
    m = jnp.array([[[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
    y = batched_affine_warp(x, m)
    assert float(y[0, 2, 1, 0]) > 0.9
    assert float(y[0, 2, 2, 0]) < 0.1


@pytest.mark.slow
def test_device_augment_shapes_and_range():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (4, 32, 128, 3)).astype(np.float32))
    y = jax.jit(device_augment)(key, x)
    assert y.shape == x.shape and y.dtype == x.dtype
    assert float(jnp.max(jnp.abs(y))) <= 1.0
    # different key -> different augmentation
    y2 = jax.jit(device_augment)(jax.random.PRNGKey(1), x)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


@pytest.mark.slow
def test_device_aug_pretrain_step():
    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.pretrain import (
        init_pretrain_state,
        make_device_view_fn,
        make_pretrain_step,
    )
    from dig_tpu.utils.schedules import (
        contrast_weight_schedule,
        cosine_schedule,
        moco_momentum_schedule,
    )
    from tests.test_train_steps import tiny_pretrain_model

    model = tiny_pretrain_model()
    tx = make_optimizer(cosine_schedule(1e-3, 1e-5, 1, 2))
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    view_fn = make_device_view_fn(model.num_patches, 0.7, 2)
    step_fn = make_pretrain_step(
        model, moco_momentum_schedule(0.99, 1, 2),
        contrast_weight_schedule(0.1, 1, 2),
    )
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 128, 3)).astype(np.float32)
    )
    batch = view_fn(jax.random.PRNGKey(2), images)
    assert batch["mask"].shape == (8, 2, 256)
    assert np.asarray(batch["mask"]).sum(-1).tolist() == [[179, 179]] * 8
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_contrast"]))


def test_projective_identity_and_translation():
    from dig_tpu.data.device_aug import batched_projective_warp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 8, 16, 3)), jnp.float32)
    eye = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    out = batched_projective_warp(img, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # pure +2px x-translation of the SOURCE lookup: out[x] = img[x+2]
    t = eye.at[:, 0, 2].set(2.0)
    out = np.asarray(batched_projective_warp(img, t))
    np.testing.assert_allclose(out[:, :, :-2], np.asarray(img)[:, :, 2:], atol=1e-5)


def test_solve_homography_roundtrip():
    """DLT solve maps the source quad exactly onto the destination quad."""
    from dig_tpu.data.device_aug import _solve_homography

    rng = np.random.default_rng(1)
    src = jnp.asarray(
        [[[0, 0], [127, 0], [127, 31], [0, 31]]], jnp.float32)
    dst = src + jnp.asarray(rng.uniform(-5, 5, size=(1, 4, 2)), jnp.float32)
    h = _solve_homography(src, dst)
    pts = jnp.concatenate([src, jnp.ones((1, 4, 1))], -1)
    mapped = jnp.einsum("bij,bnj->bni", h, pts)
    mapped = mapped[..., :2] / mapped[..., 2:3]
    np.testing.assert_allclose(np.asarray(mapped), np.asarray(dst), atol=1e-3)


def test_device_abi_augment_shapes_range_determinism():
    from dig_tpu.data.device_aug import device_abi_augment

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(-1, 1, size=(8, 32, 128, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = device_abi_augment(key, img)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0
    # deterministic per key; different keys differ
    out2 = device_abi_augment(key, img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = device_abi_augment(jax.random.PRNGKey(1), img)
    assert not np.allclose(np.asarray(out), np.asarray(out3))
    # with a large batch, SOME samples must be augmented
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_device_abi_augment_gates_off_identity():
    from dig_tpu.data.device_aug import device_abi_augment

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(-0.9, 0.9, size=(4, 32, 128, 3)), jnp.float32)
    out = device_abi_augment(jax.random.PRNGKey(0), img,
                             p_geom=0.0, p_deter=0.0, p_jitter=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
