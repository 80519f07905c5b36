"""Auxiliary SSL losses kept for capability parity.

The reference ships two additional losses that are *latent* (imported
nowhere / missing imports): the DINO-style teacher-centering CE
(`EMALoss`, loss/emaLoss.py:5-57 — broken: uses np/dist without imports)
and the MSN prototype loss with me-max regularizer + distributed sinkhorn
(loss/msnLoss.py:31-140 — same).  These are working JAX implementations
of the same math; under `jit` over a sharded mesh the cross-replica mean
in the centering/sinkhorn steps is global automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dino_loss(student_logits, teacher_logits, center, student_temp=0.1,
              teacher_temp=0.04, center_momentum=0.9):
    """DINO cross-entropy with teacher centering.

    Returns (loss, new_center).  Teacher probabilities are softmaxed after
    subtracting the running center; the center EMA-tracks the global batch
    mean of teacher logits."""
    t = jax.nn.softmax((teacher_logits - center) / teacher_temp, axis=-1)
    t = jax.lax.stop_gradient(t)
    log_s = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
    loss = jnp.mean(jnp.sum(-t * log_s, axis=-1))
    batch_center = jnp.mean(teacher_logits, axis=0, keepdims=True)
    new_center = center * center_momentum + batch_center * (1.0 - center_momentum)
    return loss, jax.lax.stop_gradient(new_center)


def sinkhorn(scores, n_iter: int = 3, eps: float = 1e-8):
    """Distributed Sinkhorn-Knopp normalization of a [N, K] score matrix
    (rows sum to 1, columns balanced); under pjit N is the global batch."""
    q = jnp.exp(scores).T  # [K, N]
    q = q / (jnp.sum(q) + eps)
    k, n = q.shape

    def body(q, _):
        q = q / (jnp.sum(q, axis=1, keepdims=True) + eps) / k
        q = q / (jnp.sum(q, axis=0, keepdims=True) + eps) / n
        return q, None

    q, _ = jax.lax.scan(body, q, None, length=n_iter)
    return (q * n).T


def msn_loss(anchors, targets, prototypes, temperature=0.1, me_max_weight=1.0,
             use_sinkhorn=True, use_entropy=False):
    """MSN: soft prototype assignment CE + me-max regularizer.

    anchors/targets: [N, D] L2-normalizable embeddings; prototypes [K, D].
    Returns (loss, metrics_dict)."""

    def snn(z, temp):
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        p = prototypes / (jnp.linalg.norm(prototypes, axis=-1, keepdims=True) + 1e-12)
        return jax.nn.softmax(z @ p.T / temp, axis=-1)

    probs = snn(anchors, temperature)
    tprobs = snn(targets, temperature)
    if use_sinkhorn:
        tprobs = sinkhorn(jnp.log(tprobs + 1e-12))
    tprobs = jax.lax.stop_gradient(tprobs)

    ce = jnp.mean(jnp.sum(-tprobs * jnp.log(probs + 1e-12), axis=-1))
    avg_probs = jnp.mean(probs, axis=0)
    rloss = -jnp.sum(jnp.log(avg_probs ** (-avg_probs) + 1e-12))
    loss = ce + me_max_weight * rloss
    if use_entropy:
        ent = -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1))
        loss = loss + ent
    return loss, {"msn_ce": ce, "msn_rloss": rloss}
