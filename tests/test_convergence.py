"""Small end-to-end convergence checks (SURVEY.md §4: overfit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.optim import make_optimizer

pytestmark = pytest.mark.slow
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)
from tests.test_train_steps import make_pretrain_batch, tiny_pretrain_model


def test_pretrain_losses_decrease():
    """Fixed batch, 25 steps: both the pixel and contrastive losses must
    drop substantially (the SSL step learns)."""
    model = tiny_pretrain_model()
    steps = 25
    tx = make_optimizer(cosine_schedule(3e-3, 1e-4, 1, steps, warmup_steps=2),
                        clip_grad=3.0)
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, steps),
        contrast_weight_schedule(0.1, 1, steps, warmup_steps=1),
    )
    batch = {k: jnp.asarray(v) for k, v in make_pretrain_batch(
        np.random.default_rng(0), b=8).items()}
    pix, contra = [], []
    for i in range(steps):
        state, m = step_fn(state, batch, jax.random.PRNGKey(1))
        pix.append(float(m["loss_pixel"]))
        contra.append(float(m["loss_contrast"]))
    assert pix[-1] < pix[1] * 0.7, pix[::6]
    assert contra[-1] < contra[1], contra[::6]


def test_seq_cls_model_overfits():
    from dig_tpu.models.rec_model import SeqClsTokenRecModel
    from dig_tpu.models.vit import VisionTransformer
    from dig_tpu.train.finetune import init_finetune_state, make_finetune_step

    num_classes, max_len, b = 12, 6, 8
    enc = VisionTransformer(img_size=(32, 128), patch_size=4, embed_dim=32,
                            depth=2, num_heads=2, qkv_bias=True,
                            use_seq_cls_token=True, max_seq_len=max_len)
    model = SeqClsTokenRecModel(encoder=enc, nb_classes=num_classes)
    steps = 150
    tx = make_optimizer(cosine_schedule(5e-3, 1e-4, 1, steps, warmup_steps=5))
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=max_len)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, 32, 128, 3)).astype(np.float32))
    lens = np.full((b,), max_len, np.int32)
    targets = rng.integers(0, num_classes - 3, (b, max_len)).astype(np.int32)
    batch = {"images": images, "targets": jnp.asarray(targets),
             "lengths": jnp.asarray(lens)}
    step_fn = make_finetune_step(model, smoothing=0.0)
    losses = []
    for i in range(steps):
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.3, losses[::15]
    probs, ids = model.apply({"params": state.params}, images,
                             method=model.recognize)
    assert ids.shape == (b, max_len)


def test_build_rec_model_seq_cls_kind():
    from dig_tpu.models.rec_model import build_rec_model

    m = build_rec_model(model_name="vit_micro_patch4_32x128", model_kind="seq_cls",
                        nb_classes=97, max_len=25)
    assert m.encoder.use_seq_cls_token
