"""Windowed SimCLR NT-Xent loss over horizontally pooled sequence features.

Parity target: `SeqSimCLRLoss` (reference: loss/seqSimCLRLoss.py:5-79):
features [B, N, C] are average-pooled along the width into `num_windows`
windows; each window is a contrastive sample; positives are the same window
under the other view; the other ``2(B*W - 1)`` windows in the batch are
negatives.  Cosine similarity / temperature, CE over [positive, negatives].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool_windows(z: jnp.ndarray, num_windows: int) -> jnp.ndarray:
    """[B, N, C] -> [B * num_windows, C] via adaptive average pooling along
    the token/width axis (the reference pools the flattened token sequence
    as a 1 x N map — i.e. a height-1 grid through the shared PyTorch-bin
    pooler, models/moco.py::adaptive_window_pool)."""
    from dig_tpu.models.moco import adaptive_window_pool

    b, n, c = z.shape
    return adaptive_window_pool(z[:, None], num_windows).reshape(
        b * num_windows, c)


def seq_simclr_loss(z_i: jnp.ndarray, z_j: jnp.ndarray, temperature: float,
                    num_windows: int = 5) -> jnp.ndarray:
    zi = _pool_windows(z_i, num_windows)
    zj = _pool_windows(z_j, num_windows)
    m = zi.shape[0]
    z = jnp.concatenate([zi, zj], axis=0)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    sim = jnp.einsum("ic,jc->ij", z, z) / temperature
    n = 2 * m
    pos_idx = jnp.concatenate([jnp.arange(m) + m, jnp.arange(m)])
    positives = sim[jnp.arange(n), pos_idx][:, None]
    mask = ~jnp.eye(n, dtype=bool)
    mask = mask.at[jnp.arange(n), pos_idx].set(False)
    negatives = jnp.where(mask, sim, -1e30)
    logits = jnp.concatenate([positives, negatives], axis=1)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logprobs[:, 0])
