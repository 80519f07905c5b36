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
