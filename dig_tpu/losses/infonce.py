"""MoCo v3-style InfoNCE over globally gathered keys.

Parity target: `MoCo_ViT.contrastive_loss`
(reference: modeling_pretrain_moco_mim_ori.py:444-461) together with its
`concat_all_gather` (:580-591) and rank-offset positive labels (:453),
scaled by ``2 * T``, with optional label smoothing
(`label_smooth_loss`, :609-625) and top-k accuracy (:593-607).

TPU-native design: the reference gathers momentum keys with an explicit
NCCL all_gather and offsets the labels by ``rank * N``.  Under `jit` over
a data-sharded mesh the queries and keys are *logically global* arrays —
``logits = q @ k.T`` with ``labels = arange(global_N)`` compiles to the
same cross-chip gather on ICI via GSPMD, with no hand-written collective
and no rank bookkeeping.  The math is identical: global row i's positive
is global key i.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smooth_softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                            smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE with the reference's smoothing parameterization:
    positive prob mass ``(1 - s) + s/C``, negative ``s/C`` each."""
    c = logits.shape[-1]
    acc = jnp.promote_types(logits.dtype, jnp.float32)  # never downcast f64
    logprobs = jax.nn.log_softmax(logits.astype(acc), axis=-1)
    eps = smoothing / c
    one_hot = jax.nn.one_hot(labels, c, dtype=acc)
    true_dist = one_hot * (1.0 - smoothing) + eps
    return jnp.mean(jnp.sum(-true_dist * logprobs, axis=-1))


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, ks=(1, 5)):
    """Percent top-k accuracy (reference: modeling_pretrain_moco_mim_ori.py:593-607)."""
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == labels[:, None]
    return [100.0 * jnp.mean(jnp.any(correct[:, :k], axis=-1).astype(jnp.float32)) for k in ks]


def info_nce_loss(q: jnp.ndarray, k: jnp.ndarray, temperature: float,
                  smoothing: float = 0.0, return_acc: bool = False):
    """q, k: [N, D] (N = global batch under pjit).  Keys must already be
    detached (stop_gradient) by the caller, matching the reference's
    no-grad momentum branch."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    logits = jnp.einsum("nc,mc->nm", q, k) / temperature
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss = label_smooth_softmax_ce(logits, labels, smoothing) * (2.0 * temperature)
    if return_acc:
        acc1, acc5 = topk_accuracy(logits, labels, ks=(1, 5))
        return loss, (acc1, acc5)
    return loss
