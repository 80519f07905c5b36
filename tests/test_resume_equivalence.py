"""Training-continuation equivalence: resuming from a checkpoint must be
indistinguishable from never having stopped.

The reference can only restart+resume and never verifies the two paths
agree (utils/utils.py:581-669).  Here we assert bit-equality of the full
state surface after `save -> restore -> continue` vs an uninterrupted
run: params, the EMA (momentum-encoder) tree, the optimizer state — and,
in the finetune arm, optax.MultiSteps' mid-accumulation counters and
gradient accumulators, since the preemption-safe SIGTERM checkpoint
(utils/preemption.py) can land between micro-steps of an --update_freq
group.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import TFDecoder
from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.models.rec_model import RecModel
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.optim import make_optimizer
from dig_tpu.train.finetune import init_finetune_state, make_finetune_step
from dig_tpu.train.pretrain import init_pretrain_state, make_pretrain_step
from dig_tpu.utils.checkpoint import auto_resume, save_checkpoint
from dig_tpu.utils.schedules import (
    contrast_weight_schedule,
    cosine_schedule,
    moco_momentum_schedule,
)

pytestmark = pytest.mark.slow


def assert_trees_bitequal(a, b, what):
    la = jax.tree_util.tree_leaves(jax.device_get(a))
    lb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(la) == len(lb), what
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, what
        np.testing.assert_array_equal(x, y, err_msg=what)


def test_pretrain_resume_bitequal(tmp_path):
    model = DiGPretrainModel(
        img_size=(32, 128), patch_size=4, encoder_embed_dim=32,
        encoder_depth=2, encoder_num_heads=2, decoder_num_classes=48,
        decoder_embed_dim=32, mlp_dim=64, dim=16, num_windows=4,
        qkv_bias=True, use_pixel_target=True, use_moco_target=True,
        temperature=0.2,
    )
    steps = 4
    tx = make_optimizer(cosine_schedule(1e-3, 1e-5, 1, steps, warmup_steps=1),
                        clip_grad=3.0)
    step_fn = make_pretrain_step(
        model,
        moco_momentum_schedule(0.99, 1, steps),
        contrast_weight_schedule(0.1, 1, steps, warmup_steps=1),
    )
    nprng = np.random.default_rng(0)
    batches = [
        {
            "images": jnp.asarray(nprng.normal(size=(4, 32, 128, 3)).astype(np.float32)),
            "aug_images": jnp.asarray(nprng.normal(size=(4, 32, 128, 3)).astype(np.float32)),
            "mask": jnp.asarray(nprng.random((4, 2, 256)) < 0.7),
        }
        for _ in range(steps)
    ]
    keys = [jax.random.PRNGKey(100 + i) for i in range(steps)]

    # uninterrupted run
    straight = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    for b, k in zip(batches, keys):
        straight, _ = step_fn(straight, b, k)

    # interrupted at step 2: save -> fresh init -> auto_resume -> continue
    st = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    for b, k in zip(batches[:2], keys[:2]):
        st, _ = step_fn(st, b, k)
    save_checkpoint(str(tmp_path), 0, st, extra={"epoch": 0})

    resumed = init_pretrain_state(model, tx, jax.random.PRNGKey(0))
    resumed, extra = auto_resume(str(tmp_path), resumed)
    assert extra == {"epoch": 0}
    assert int(resumed.step) == 2
    for b, k in zip(batches[2:], keys[2:]):
        resumed, _ = step_fn(resumed, b, k)

    assert_trees_bitequal(straight.params, resumed.params, "params")
    assert_trees_bitequal(straight.ema_params, resumed.ema_params, "ema")
    assert_trees_bitequal(straight.opt_state, resumed.opt_state, "opt_state")
    assert int(straight.step) == int(resumed.step) == steps


def test_finetune_resume_mid_accumulation_bitequal(tmp_path):
    """Interrupt BETWEEN micro-steps of an --update_freq 2 group: the
    MultiSteps counter and the accumulated (not yet applied) gradients
    must survive the checkpoint roundtrip bit-exactly."""
    import optax

    model = RecModel(
        encoder=VisionTransformer(img_size=(32, 128), patch_size=4,
                                  embed_dim=32, depth=2, num_heads=2,
                                  qkv_bias=True),
        decoder=TFDecoder(num_classes=12, n_layers=1, d_embedding=32,
                          n_head=2, d_k=16, d_v=16, d_model=32, d_inner=64,
                          max_seq_len=5, dropout=0.0),
    )
    tx = optax.MultiSteps(make_optimizer(cosine_schedule(1e-2, 1e-3, 1, 4)),
                          every_k_schedule=2)
    step_fn = make_finetune_step(model, smoothing=0.0)
    nprng = np.random.default_rng(1)
    batches = [
        {
            "images": jnp.asarray(nprng.normal(size=(2, 32, 128, 3)).astype(np.float32)),
            "targets": jnp.asarray(nprng.integers(0, 9, (2, 5)).astype(np.int32)),
            "lengths": jnp.asarray(np.full((2,), 5, np.int32)),
        }
        for _ in range(4)
    ]
    keys = [jax.random.PRNGKey(200 + i) for i in range(4)]

    straight = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=5)
    for b, k in zip(batches, keys):
        straight, _, _ = step_fn(straight, b, k)

    # interrupt after ONE micro-step: counter=1, accumulators non-empty
    st = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=5)
    st, _, _ = step_fn(st, batches[0], keys[0])
    # numeric tag: the preemption-safe SIGTERM save uses one, and only
    # numeric tags match auto_resume's scan (like the reference's regex)
    save_checkpoint(str(tmp_path), 0, st, extra={"epoch": 0})

    resumed = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=5)
    resumed, _ = auto_resume(str(tmp_path), resumed)
    assert int(resumed.step) == 1
    for b, k in zip(batches[1:], keys[1:]):
        resumed, _, _ = step_fn(resumed, b, k)

    assert_trees_bitequal(straight.params, resumed.params, "params")
    assert_trees_bitequal(straight.opt_state, resumed.opt_state, "opt_state")
