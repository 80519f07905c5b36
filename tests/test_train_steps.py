"""End-to-end train-step tests on the 8-device CPU mesh: pretrain step
(MoCo+MIM), finetune overfit, and eval decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import TFDecoder
from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.models.rec_model import RecModel
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.optim import make_optimizer
from dig_tpu.parallel.mesh import create_mesh, shard_batch
from dig_tpu.train.finetune import init_finetune_state, make_eval_step, make_finetune_step
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)


def tiny_pretrain_model(**kw):
    defaults = dict(
        img_size=(32, 128), patch_size=4, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, decoder_num_classes=48, decoder_embed_dim=32,
        mlp_dim=64, dim=16, num_windows=4, qkv_bias=True,
        use_pixel_target=True, use_moco_target=True, temperature=0.2,
    )
    defaults.update(kw)
    return DiGPretrainModel(**defaults)


def make_pretrain_batch(rng, b=8, num_view=2, n=256):
    return {
        "images": rng.normal(size=(b, 32, 128, 3)).astype(np.float32),
        "aug_images": rng.normal(size=(b, 32, 128, 3)).astype(np.float32),
        "mask": rng.random((b, num_view, n)) < 0.7,
    }


def test_device_count():
    assert jax.device_count() == 8


@pytest.mark.slow
def test_pretrain_step_runs_and_updates_ema():
    model = tiny_pretrain_model()
    steps = 4
    lr = cosine_schedule(1e-3, 1e-5, 1, steps, warmup_steps=1)
    tx = make_optimizer(lr, clip_grad=3.0)
    rng = jax.random.PRNGKey(0)
    state = init_pretrain_state(model, tx, rng)
    assert set(state.ema_params) == {"encoder", "projection", "patch_extractor", "pix_projector"}

    mesh = create_mesh()
    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, steps),
        contrast_weight_schedule(0.1, 1, steps, warmup_steps=2),
        mesh=mesh,
    )
    nprng = np.random.default_rng(0)
    old_ema = jax.tree_util.tree_map(np.asarray, jax.device_get(state.ema_params))
    # step 0 has lr=0 (warmup linspace starts at 0, like the reference), so
    # 3 steps are needed before the EMA visibly tracks a param change
    for i in range(3):
        batch = shard_batch(mesh, make_pretrain_batch(nprng))
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_pixel"]))
    assert np.isfinite(float(metrics["loss_contrast"]))
    assert 0.0 <= float(metrics["q1_acc1"]) <= 100.0
    diff = sum(
        float(np.abs(a - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(old_ema),
            jax.tree_util.tree_leaves(jax.device_get(state.ema_params)),
        )
    )
    assert diff > 0.0, "EMA params did not move"
    assert int(state.step) == 3


@pytest.mark.slow
def test_pretrain_simmim_only():
    model = tiny_pretrain_model(use_moco_target=False, use_pix_projector=False)
    lr = cosine_schedule(1e-3, 1e-5, 1, 2)
    tx = make_optimizer(lr)
    state = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    step_fn = make_pretrain_step(
        model, moco_momentum_schedule(0.99, 1, 2), contrast_weight_schedule(0.0, 1, 2)
    )
    batch = make_pretrain_batch(np.random.default_rng(1))
    state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()},
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_pixel"]))
    assert "loss_contrast" not in metrics


def tiny_rec_model(num_classes=12, max_len=6):
    enc = VisionTransformer(img_size=(32, 128), patch_size=4, embed_dim=32, depth=2,
                            num_heads=2, qkv_bias=True)
    dec = TFDecoder(num_classes=num_classes, n_layers=1, d_embedding=32, n_head=2,
                    d_k=16, d_v=16, d_model=32, d_inner=64, max_seq_len=max_len,
                    dropout=0.0)
    return RecModel(encoder=enc, decoder=dec)


@pytest.mark.slow
def test_finetune_overfit_and_eval():
    num_classes, max_len, b = 12, 6, 8
    model = tiny_rec_model(num_classes, max_len)
    steps = 80
    lr = cosine_schedule(2e-3, 1e-4, 1, steps, warmup_steps=5)
    tx = make_optimizer(lr, clip_grad=5.0)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=max_len)

    rng = np.random.default_rng(0)
    eos = num_classes - 3
    images = rng.normal(size=(b, 32, 128, 3)).astype(np.float32)
    lens = rng.integers(2, max_len, size=(b,))
    targets = np.full((b, max_len), num_classes - 2, np.int32)  # PADDING
    for i, L in enumerate(lens):
        targets[i, : L - 1] = rng.integers(0, eos, size=(L - 1,))
        targets[i, L - 1] = eos

    batch = {
        "images": jnp.asarray(images),
        "targets": jnp.asarray(targets),
        "lengths": jnp.asarray(lens.astype(np.int32)),
    }
    step_fn = make_finetune_step(model, smoothing=0.0)
    losses = []
    for i in range(steps):
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.2, losses[::20]

    eval_fn = make_eval_step(model, beam_width=0, eos=eos)
    ids, loss = eval_fn(state.params, batch)
    assert loss.shape == (b,)
    ids = np.asarray(ids)
    # overfit: greedy decode should reproduce the target strings
    correct = 0
    for i, L in enumerate(lens):
        if np.array_equal(ids[i, :L], targets[i, :L]):
            correct += 1
    assert correct >= b - 1, (ids, targets)


def test_fsdp_mesh_builds():
    mesh = create_mesh(n_data=4, n_fsdp=2)
    assert mesh.shape == {"data": 4, "fsdp": 2, "tensor": 1}
