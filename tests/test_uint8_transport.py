"""uint8 batch transport: datasets ship raw uint8 HWC and the jitted
steps normalize on-device (`ops/images.to_model_images`).  These tests pin
the contract: (1) the on-device math is BIT-IDENTICAL to the old host-side
`resize_normalize` float path, (2) float inputs pass through untouched
(hand-built test batches / external callers), (3) a train step fed the
uint8 batch produces exactly the same loss as the float batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.data.transforms import resize_normalize, resize_uint8
from dig_tpu.ops.images import to_model_images


def test_device_normalize_bit_identical_to_host():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 150, 3), dtype=np.uint8)
    host = resize_normalize(img, 32, 128)
    dev = np.asarray(to_model_images(jnp.asarray(resize_uint8(img, 32, 128))))
    assert host.dtype == dev.dtype == np.float32
    assert np.array_equal(host, dev)  # same fp32 expression -> bitwise equal


def test_float_passthrough():
    x = jnp.linspace(-1, 1, 12, dtype=jnp.float32).reshape(1, 2, 2, 3)
    assert to_model_images(x) is x
    xb = x.astype(jnp.bfloat16)
    assert to_model_images(xb) is xb


def test_finetune_step_uint8_equals_float():
    from dig_tpu.models.rec_model import build_rec_model
    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.finetune import init_finetune_state, make_finetune_step
    from dig_tpu.utils.schedules import cosine_schedule

    model = build_rec_model("vit_micro_patch4_32x128", "small_tf_decoder")
    tx = make_optimizer(cosine_schedule(1e-3, 1e-4, 1, 10))
    rng = np.random.default_rng(1)
    b = 4
    u8 = rng.integers(0, 256, size=(b, 32, 128, 3), dtype=np.uint8)
    targets = rng.integers(0, 94, size=(b, 25)).astype(np.int32)
    targets[:, 3] = 94
    lens = np.full((b,), 4, np.int32)
    step = make_finetune_step(model, smoothing=0.1)

    losses = {}
    for kind, images in (("uint8", u8),
                         ("float", (u8.astype(np.float32) / 255.0 - 0.5) / 0.5)):
        state = init_finetune_state(model, tx, jax.random.PRNGKey(0))
        batch = {"images": jnp.asarray(images), "targets": jnp.asarray(targets),
                 "lengths": jnp.asarray(lens)}
        _, metrics, _ = step(state, batch, jax.random.PRNGKey(2))
        losses[kind] = float(metrics["loss"])
    assert losses["uint8"] == losses["float"], losses
