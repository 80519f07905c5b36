"""GRU additive-attention recognition head (ASTER-style).

Parity target: `AttentionRecognitionHead` / `AttentionUnit` / `DecoderUnit`
(reference: models/attn_decoder.py:11-279): per step, additive attention
over encoder tokens conditioned on the GRU state produces a context vector
that is concatenated with the previous-symbol embedding and fed to a GRU;
a linear head emits class logits.  BOS is ``num_classes`` (one past vocab).

TPU redesign: the per-step Python loop becomes a `lax.scan`; the
key-side attention projection (`xEmbed`) is hoisted out of the loop —
identical math, one big MXU matmul instead of T small ones.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dig_tpu.models.decoder import beam_backtrack, beam_select


class AttentionRecognitionHead(nn.Module):
    num_classes: int
    s_dim: int = 512
    att_dim: int = 512
    max_len_labels: int = 25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.s_embed = nn.Dense(self.att_dim, dtype=self.dtype)
        self.x_embed = nn.Dense(self.att_dim, dtype=self.dtype)
        self.w_embed = nn.Dense(1, dtype=self.dtype)
        self.tgt_embedding = nn.Embed(self.num_classes + 1, self.att_dim, dtype=self.dtype)
        self.gru = nn.GRUCell(features=self.s_dim, dtype=self.dtype)
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def _attend(self, x, x_proj, state):
        s_proj = self.s_embed(state)[:, None, :]
        score = self.w_embed(jnp.tanh(s_proj + x_proj))[..., 0]  # [B, T]
        alpha = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.einsum("bt,btc->bc", alpha, x)

    def _step(self, x, x_proj, state, y_prev):
        context = self._attend(x, x_proj, state)
        y_emb = self.tgt_embedding(y_prev)
        state, out = self.gru(state, jnp.concatenate([y_emb, context], axis=-1))
        return state, self.fc(out)

    def __call__(self, x, targets):
        """Teacher-forced training: returns [B, max_len, num_classes] logits.

        Step 0 runs unrolled (so parameter creation happens outside the
        scan at init time); steps 1..T-1 run in a lax.scan."""
        b = x.shape[0]
        x_proj = self.x_embed(x)
        state = jnp.zeros((b, self.s_dim), x.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)
        state, logits0 = self._step(x, x_proj, state, bos)

        def body(state, t):
            state, logits = self._step(x, x_proj, state, targets[:, t - 1])
            return state, logits

        _, logits_rest = jax.lax.scan(
            body, state, jnp.arange(1, self.max_len_labels)
        )
        return jnp.concatenate(
            [logits0[:, None], logits_rest.transpose(1, 0, 2)], axis=1
        )

    def sample(self, x):
        """Greedy inference: returns (probs [B, T, C], ids [B, T])."""
        b = x.shape[0]
        x_proj = self.x_embed(x)
        state = jnp.zeros((b, self.s_dim), x.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)
        state, logits0 = self._step(x, x_proj, state, bos)
        probs0 = jax.nn.softmax(logits0.astype(jnp.float32), axis=-1)
        pred0 = jnp.argmax(probs0, axis=-1).astype(jnp.int32)

        def body(carry, _):
            state, y_prev = carry
            state, logits = self._step(x, x_proj, state, y_prev)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return (state, pred), (probs, pred)

        _, (probs_rest, ids_rest) = jax.lax.scan(
            body, (state, pred0), None, length=self.max_len_labels - 1
        )
        probs = jnp.concatenate([probs0[:, None], probs_rest.transpose(1, 0, 2)], 1)
        ids = jnp.concatenate([pred0[:, None], ids_rest.transpose(1, 0)], 1)
        return probs, ids

    def beam_search(self, x, beam_width: int, eos: int):
        """Jittable beam search over the GRU head with the reference's
        TopKDecoder semantics (models/attn_decoder.py:84-200): beams fold
        into the batch, the GRU state is re-gathered by predecessor each
        step, a beam that emits EOS is KILLED (score -> -inf) and its
        completed hypothesis is recovered by the shared stored-predecessor
        backtracking — identical selection/backtrack code to
        `TFDecoder.beam_search` (decoder.beam_select / beam_backtrack).
        Pinned against a numpy port of the reference algorithm in
        tests/test_torch_gru_parity.py.  Returns ids [B, T]."""
        b = x.shape[0]
        k = beam_width
        xk = jnp.repeat(x, k, axis=0)
        x_proj = self.x_embed(xk)
        state = jnp.zeros((b * k, self.s_dim), x.dtype)
        scores = jnp.where(jnp.arange(b * k) % k == 0, 0.0, -jnp.inf)
        tokens = jnp.full((b * k,), self.num_classes, jnp.int32)

        def body(carry, t):
            state, tokens, scores = carry
            state, logits = self._step(xk, x_proj, state, tokens)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            top_scores, pred, sym, scores = beam_select(
                scores, logp, b, self.num_classes, eos)
            # the reference reorders the GRU state by predecessor
            # (state.index_select(1, predecessors), :129) — unlike the
            # TFDecoder beam, conditioning follows the winning beam here
            state = state[pred]
            return (state, sym, scores), (top_scores, pred, sym)

        (_, _, _), (st_scores, st_preds, st_syms) = jax.lax.scan(
            body, (state, tokens, scores), jnp.arange(self.max_len_labels)
        )
        return beam_backtrack(st_scores, st_preds, st_syms, b, k, eos)
