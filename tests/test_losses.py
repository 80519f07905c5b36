import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.losses import (
    info_nce_loss,
    label_smooth_softmax_ce,
    seq_cross_entropy,
    seq_label_smoothing_cross_entropy,
    seq_simclr_loss,
    topk_accuracy,
)


def _ref_seq_ce(logits, targets, lengths, smoothing=0.0):
    """Golden numpy implementation of the reference loss math
    (loss/seqLabelSmoothingCrossEntropyLoss.py:51-70)."""
    logits = np.asarray(logits, np.float64)
    b, t, c = logits.shape
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    mask = (np.arange(t)[None] < np.asarray(lengths)[:, None]).astype(np.float64)
    nll = -np.take_along_axis(logp, np.asarray(targets)[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(-1)
    loss = ((1 - smoothing) * nll + smoothing * smooth) * mask
    return loss.sum() / b


def test_seq_ce_matches_golden():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 6, 10)).astype(np.float32)
    targets = np.array([[0, 2, 4, 5, 5, 5], [1, 3, 5, 5, 5, 5]], np.int32)
    lengths = np.array([3, 2], np.int32)
    got = seq_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths))
    assert np.isclose(float(got), _ref_seq_ce(logits, targets, lengths), atol=1e-5)


def test_seq_ce_rows_mean_equals_reduced():
    """The per-row form (used by eval to drop static-shape pad rows)
    reduces to the sample-normalized scalar, and a pad row (targets=0,
    len=1) contributes exactly its own NLL — droppable on the host."""
    from dig_tpu.losses.seq_ce import seq_cross_entropy_rows

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 6, 10)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 10, size=(4, 6)).astype(np.int32))
    lengths = jnp.asarray(np.array([6, 3, 1, 2], np.int32))
    rows = seq_cross_entropy_rows(logits, targets, lengths)
    assert rows.shape == (4,)
    assert np.isclose(float(rows.mean()),
                      float(seq_cross_entropy(logits, targets, lengths)),
                      atol=1e-5)
    # dropping a row == the scalar over the remaining rows
    sub = seq_cross_entropy(logits[:3], targets[:3], lengths[:3])
    assert np.isclose(float(rows[:3].mean()), float(sub), atol=1e-5)


def test_label_smoothing_reduces_to_ce_at_zero():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 7)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 7, size=(2, 4)).astype(np.int32))
    lengths = jnp.asarray(np.array([4, 2], np.int32))
    a = seq_cross_entropy(logits, targets, lengths)
    b = seq_label_smoothing_cross_entropy(logits, targets, lengths, smoothing=0.0)
    assert np.isclose(float(a), float(b), atol=1e-6)


def test_label_smoothing_matches_golden():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(3, 5, 8)).astype(np.float32)
    targets = rng.integers(0, 8, size=(3, 5)).astype(np.int32)
    lengths = np.array([5, 3, 1], np.int32)
    got = seq_label_smoothing_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths), smoothing=0.1
    )
    assert np.isclose(float(got), _ref_seq_ce(logits, targets, lengths, 0.1), atol=1e-5)


def test_label_smooth_softmax_ce_zero_smoothing_is_ce():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(6, 12)).astype(np.float32))
    labels = jnp.arange(6)
    got = label_smooth_softmax_ce(logits, labels, 0.0)
    expect = -jax.nn.log_softmax(logits)[jnp.arange(6), labels].mean()
    assert np.isclose(float(got), float(expect), atol=1e-6)


def test_info_nce_identity_alignment():
    # queries == keys: positives dominate, loss should be small with low T
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    loss_aligned = info_nce_loss(q, q, temperature=0.05)
    k_random = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    loss_random = info_nce_loss(q, k_random, temperature=0.05)
    assert float(loss_aligned) < float(loss_random)


def test_info_nce_acc():
    q = jnp.eye(8, 16)
    loss, (acc1, acc5) = info_nce_loss(q, q, temperature=0.2, return_acc=True)
    assert float(acc1) == 100.0 and float(acc5) == 100.0


def test_info_nce_scaling_matches_reference():
    # reference scales the CE by 2*T (modeling_pretrain_moco_mim_ori.py:458)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    t = 0.2
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    logits = qn @ kn.T / t
    ce = -jax.nn.log_softmax(logits)[jnp.arange(4), jnp.arange(4)].mean()
    got = info_nce_loss(q, k, temperature=t)
    assert np.isclose(float(got), float(ce) * 2 * t, atol=1e-5)


@pytest.mark.slow
def test_simclr_prefers_aligned_views():
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.normal(size=(4, 32, 16)).astype(np.float32))
    other = jnp.asarray(rng.normal(size=(4, 32, 16)).astype(np.float32))
    aligned = seq_simclr_loss(z, z, temperature=0.1, num_windows=4)
    misaligned = seq_simclr_loss(z, other, temperature=0.1, num_windows=4)
    assert float(aligned) < float(misaligned)
