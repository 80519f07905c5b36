"""Frozen layers, feature distillation, CTC training, multi-label branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import DecoupledTFDecoder, TFDecoder
from dig_tpu.models.rec_model import CTCRecModel, MultiLabelHead, RecModel, SeqClsRecModel
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.optim import frozen_encoder_mask, make_optimizer
from dig_tpu.train.finetune import (
    init_finetune_state,
    make_ctc_step,
    make_distill_finetune_step,
)
from dig_tpu.train.state import TrainState
from dig_tpu.utils.schedules import cosine_schedule


def tiny_enc(**kw):
    d = dict(img_size=(32, 128), patch_size=4, embed_dim=32, depth=2, num_heads=2,
             qkv_bias=True)
    d.update(kw)
    return VisionTransformer(**d)


def tiny_dec(**kw):
    d = dict(num_classes=12, n_layers=1, d_embedding=32, n_head=2, d_k=16, d_v=16,
             d_model=32, d_inner=64, max_seq_len=5, dropout=0.0)
    d.update(kw)
    return TFDecoder(**d)


def make_batch(b=4, max_len=5, num_classes=12):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(size=(b, 32, 128, 3)).astype(np.float32)),
        "targets": jnp.asarray(rng.integers(0, num_classes - 3, (b, max_len)).astype(np.int32)),
        "lengths": jnp.asarray(np.full((b,), max_len, np.int32)),
    }


@pytest.mark.slow
def test_frozen_layers_do_not_update():
    model = RecModel(encoder=tiny_enc(), decoder=tiny_dec())
    lr = cosine_schedule(1e-2, 1e-3, 1, 4)
    tx = make_optimizer(lr, clip_grad=None, frozen=frozen_encoder_mask(1))
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=5)
    from dig_tpu.train.finetune import make_finetune_step

    step_fn = make_finetune_step(model, smoothing=0.0)
    batch = make_batch()
    p0 = jax.device_get(state.params)
    state, _, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    p1 = jax.device_get(state.params)

    def tsum(t):
        return sum(float(np.abs(np.asarray(x)).sum())
                   for x in jax.tree_util.tree_leaves(t))

    def tdiff(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert tdiff(p0["encoder"]["patch_embed"], p1["encoder"]["patch_embed"]) == 0.0
    assert tdiff(p0["encoder"]["blocks_0"], p1["encoder"]["blocks_0"]) == 0.0
    assert tdiff(p0["encoder"]["blocks_1"], p1["encoder"]["blocks_1"]) > 0.0
    assert tdiff(p0["decoder"], p1["decoder"]) > 0.0


@pytest.mark.slow
def test_distill_step():
    student = RecModel(encoder=tiny_enc(), decoder=tiny_dec(), use_feat_distill=True)
    lr = cosine_schedule(1e-3, 1e-4, 1, 4)
    tx = make_optimizer(lr)
    state = init_finetune_state(student, tx, jax.random.PRNGKey(0), max_len=5)
    teacher_params = jax.tree_util.tree_map(jnp.copy, state.params)
    step_fn = make_distill_finetune_step(student, teacher_params, smoothing=0.1)
    batch = make_batch()
    state, metrics, pred_ids = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_distill"]) >= 0.0
    assert pred_ids.shape == batch["targets"].shape


@pytest.mark.slow
def test_ctc_step_learns():
    num_classes = 12
    model = CTCRecModel(encoder=tiny_enc(), nb_classes=num_classes, d_embedding=32)
    lr = cosine_schedule(3e-3, 1e-4, 1, 30)
    tx = make_optimizer(lr, clip_grad=5.0)
    images = jnp.zeros((2, 32, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    state = TrainState.create(variables["params"], tx)
    step_fn = make_ctc_step(model, blank_id=num_classes)
    batch = make_batch(b=2, num_classes=num_classes)
    losses = []
    for i in range(30):
        state, metrics, preds = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_multi_label_head():
    head = MultiLabelHead(nb_classes=12)
    feat = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
    v = head.init(jax.random.PRNGKey(1), feat)
    cls_logit, attn = head.apply(v, feat)
    assert cls_logit.shape == (2, 12)
    assert attn.shape == (2, 12, 20)
    assert np.allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-3)


def test_seq_cls_rec_model_with_decoupled_decoder():
    dec = DecoupledTFDecoder(num_classes=12, n_layers=1, d_embedding=32, n_head=2,
                             d_k=16, d_v=16, d_model=32, d_inner=64, max_seq_len=5,
                             dropout=0.0)
    model = SeqClsRecModel(encoder=tiny_enc(), decoder=dec, nb_classes=12)
    batch = make_batch(b=2)
    v = model.init(jax.random.PRNGKey(0), batch["images"], batch["targets"],
                   batch["lengths"], True)
    logits, cls_logit, cls_maps = model.apply(
        v, batch["images"], batch["targets"], batch["lengths"], True)
    assert logits.shape == (2, 5, 12)
    assert cls_logit.shape == (2, 12)

    # eval surfaces the presence logits for the multi-label F-measure
    # (with_cls; ≙ engine_for_finetuning.py:262-269) and the teacher-
    # forced path and recognize agree on them (same deterministic branch)
    from dig_tpu.metrics.text import multi_label_f_measure
    from dig_tpu.train.finetune import make_eval_step

    eval_fn = make_eval_step(model, beam_width=0, eos=-1, with_cls=True)
    ids, loss, cls_eval = eval_fn(v["params"], batch)
    assert ids.shape == (2, 5) and loss.shape == (2,)
    assert cls_eval.shape == (2, 12)
    logits_d, cls_det, _ = model.apply(
        v, batch["images"], batch["targets"], batch["lengths"], True)
    np.testing.assert_allclose(np.asarray(cls_eval), np.asarray(cls_det),
                               rtol=2e-2, atol=2e-2)
    presence = np.zeros((2, 12), np.float32)
    presence[np.arange(2)[:, None], np.asarray(batch["targets"])] = 1.0
    f = multi_label_f_measure(np.asarray(cls_eval), presence)
    assert 0.0 <= f <= 1.0


@pytest.mark.slow
def test_update_freq_accumulation():
    """optax.MultiSteps-wrapped optimizer applies updates every k steps."""
    import optax

    model = RecModel(encoder=tiny_enc(), decoder=tiny_dec())
    lr = cosine_schedule(1e-2, 1e-3, 1, 4)
    tx = optax.MultiSteps(make_optimizer(lr), every_k_schedule=2)
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0), max_len=5)
    from dig_tpu.train.finetune import make_finetune_step

    step_fn = make_finetune_step(model, smoothing=0.0)
    batch = make_batch()
    p0 = jax.device_get(state.params)

    def tdiff(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    state, _, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    assert tdiff(p0, jax.device_get(state.params)) == 0.0  # accumulating
    state, _, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    assert tdiff(p0, jax.device_get(state.params)) > 0.0  # applied


@pytest.mark.slow
def test_distill_step_with_1d_collapse():
    """use_feat_distill + use_1d_attdec: the teacher's encode_features
    must get the same height collapse as the student feature or the
    smooth-L1 subtraction has incompatible shapes ([B,gw,C] vs [B,N,C])."""
    student = RecModel(encoder=tiny_enc(), decoder=tiny_dec(),
                       use_feat_distill=True, use_1d_attdec=True)
    lr = cosine_schedule(1e-3, 1e-4, 1, 4)
    tx = make_optimizer(lr)
    state = init_finetune_state(student, tx, jax.random.PRNGKey(0), max_len=5)
    teacher_params = jax.tree_util.tree_map(jnp.copy, state.params)
    step_fn = make_distill_finetune_step(student, teacher_params, smoothing=0.1)
    state, metrics, _ = step_fn(state, make_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # identical params + same deterministic teacher path -> distill loss is
    # the projector-vs-raw gap, finite and well-defined
    assert float(metrics["loss_distill"]) >= 0.0


def test_mim_rec_rejects_pretrain_model_names():
    from dig_tpu.models.rec_model import build_rec_model

    with pytest.raises(ValueError, match="mim_rec"):
        build_rec_model("pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
                        "small_tf_decoder", model_kind="mim_rec")
