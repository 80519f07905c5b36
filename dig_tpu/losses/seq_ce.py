"""Sequence cross-entropy losses for autoregressive recognition.

Parity targets: `SeqCrossEntropyLoss` (reference: loss/seqCrossEntropyLoss.py:19-63)
and `SeqLabelSmoothingCrossEntropyLoss`
(loss/seqLabelSmoothingCrossEntropyLoss.py:19-70).  Both are
length-masked NLL over [B, T, C] logits, summed and normalized by the
batch size (``sample_normalize``) or by the number of valid tokens
(``sequence_normalize``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _length_mask(targets: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    t = targets.shape[1]
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)


def seq_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    lengths: jnp.ndarray,
    sequence_normalize: bool = False,
    sample_normalize: bool = True,
) -> jnp.ndarray:
    assert not (sequence_normalize and sample_normalize)
    b = targets.shape[0]
    mask = _length_mask(targets, lengths)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None].astype(jnp.int32), axis=-1)
    out = jnp.sum(nll[..., 0] * mask)
    if sequence_normalize:
        out = out / jnp.sum(mask)
    if sample_normalize:
        out = out / b
    return out


def seq_cross_entropy_rows(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample masked NLL sums, shape [B] — the unreduced form of
    `seq_cross_entropy(sample_normalize=True)` (mean of this == that).
    Used by eval, where static-shape padding rows must be dropped on the
    host before averaging."""
    mask = _length_mask(targets, lengths)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None].astype(jnp.int32), axis=-1)
    return jnp.sum(nll[..., 0] * mask, axis=-1)


def seq_label_smoothing_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    lengths: jnp.ndarray,
    smoothing: float = 0.1,
    sequence_normalize: bool = False,
    sample_normalize: bool = True,
) -> jnp.ndarray:
    """confidence * NLL + smoothing * (-mean_c log p_c), length-masked."""
    assert not (sequence_normalize and sample_normalize)
    b = targets.shape[0]
    mask = _length_mask(targets, lengths)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    out = jnp.sum(loss * mask)
    if sequence_normalize:
        out = out / jnp.sum(mask)
    if sample_normalize:
        out = out / b
    return out
