"""Autoregressive transformer text decoder (Flax).

Parity targets:

* `TFDecoder` — 6-layer transformer decoder with char embedding over
  ``num_classes + 1`` symbols (BOS is the last id), sinusoid positional
  encoding, causal + length masks, teacher-forced training pass
  (reference: models/decoder.py:107-222) and greedy / beam-search
  inference (models/decoder.py:224-370),
* `TransformerDecoderLayer` (self-attn -> cross-attn -> FFN, pre-LN;
  models/transformer_layer.py:47-118) and its `MultiHeadAttention`
  (models/transformer_layer.py:204-281),
* decoder size variants (`small_tf_decoder`, `corres_*_tf_decoder`;
  models/decoder.py:13-73).

TPU-native redesign: the reference's greedy decode re-runs the full
decoder on the whole prefix at every step with no cache
(models/decoder.py:233-247).  Three jitted inference paths exist, all
numerically identical (tests/test_decoder.py):

* `greedy_decode` — token-at-a-time `lax.scan` with per-layer KV caches,
* `greedy_decode_dense` — full-prefix recompute with precomputed cross
  K/V; ~6x faster on TPU for this geometry (MXU-friendly [B*T, C]
  shapes), with optional all-EOS early exit (`lax.while_loop`),
* `beam_search` (KV-cached) and `beam_search_dense` — reference-parity
  semantics including the stored-predecessor backtracking
  (models/decoder.py:254-370); pinned numerically against a test-local
  port of the reference algorithm in tests/test_beam_parity.py.  The
  cached variant measures faster at realistic beam widths because beams
  already inflate the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.models.layers import make_causal_mask, make_pad_mask, sinusoid_position_table
from dig_tpu.ops.activations import gelu
from dig_tpu.ops.attention import multi_head_attention


class DecoderMHA(nn.Module):
    """Separate-q/k/v multi-head attention
    (reference: models/transformer_layer.py:204-281)."""

    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    dropout: float = 0.1
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dim_k, dim_v = self.n_head * self.d_k, self.n_head * self.d_v
        self.linear_q = nn.Dense(dim_k, use_bias=self.qkv_bias, dtype=self.dtype)
        self.linear_k = nn.Dense(dim_k, use_bias=self.qkv_bias, dtype=self.dtype)
        self.linear_v = nn.Dense(dim_v, use_bias=self.qkv_bias, dtype=self.dtype)
        self.fc = nn.Dense(self.d_model, use_bias=self.qkv_bias, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        self.proj_drop = nn.Dropout(self.dropout)

    def project_q(self, q_inp):
        b, lq, _ = q_inp.shape
        return self.linear_q(q_inp).reshape(b, lq, self.n_head, self.d_k)

    def project_kv(self, k_inp, v_inp):
        b, lk, _ = k_inp.shape
        k = self.linear_k(k_inp).reshape(b, lk, self.n_head, self.d_k)
        v = self.linear_v(v_inp).reshape(b, lk, self.n_head, self.d_v)
        return k, v

    def attend(self, q, k, v, mask=None, deterministic: bool = True):
        """q [B, Lq, H, Dk]; k/v [B, Lk, H, D*]; mask broadcastable to
        [B, H, Lq, Lk] (True = attend)."""
        b, lq = q.shape[:2]
        if self.dropout > 0.0 and not deterministic:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * (self.d_k**-0.5), k)
            logits = logits.astype(jnp.float32)
            if mask is not None:
                logits = jnp.where(mask, logits, -1e30)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            weights = self.attn_drop(weights, deterministic=False)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        else:
            out = multi_head_attention(q, k, v, mask=mask, scale=self.d_k**-0.5)
        out = out.reshape(b, lq, self.n_head * self.d_v)
        out = self.fc(out)
        return self.proj_drop(out, deterministic=deterministic)

    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        qp = self.project_q(q)
        kp, vp = self.project_kv(k, v)
        return self.attend(qp, kp, vp, mask, deterministic)


class PositionwiseFeedForward(nn.Module):
    """Two-layer FFN (reference: models/transformer_layer.py:386-403)."""

    d_inner: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_in = x.shape[-1]
        x = nn.Dense(self.d_inner, dtype=self.dtype, name="w_1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(d_in, dtype=self.dtype, name="w_2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre-LN: self-attn -> cross-attn -> FFN with residuals
    (reference: models/transformer_layer.py:47-118).  When
    ``text_cond_vis`` is set the cross-attention is replaced by the
    FiLM-modulated text-conditional variant, exactly as the reference
    swaps `enc_attn` (models/transformer_layer.py:76-87)."""

    d_model: int = 512
    d_inner: int = 256
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    qkv_bias: bool = False
    text_cond_vis: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mk = dict(
            n_head=self.n_head, d_k=self.d_k, d_v=self.d_v, d_model=self.d_model,
            dropout=self.dropout, qkv_bias=self.qkv_bias, dtype=self.dtype,
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.self_attn = DecoderMHA(**mk)
        self.enc_attn = TextConditionalMHA(**mk) if self.text_cond_vis else DecoderMHA(**mk)
        self.mlp = PositionwiseFeedForward(
            d_inner=self.d_inner, dropout=self.dropout, dtype=self.dtype
        )

    def __call__(self, x, enc_output, self_attn_mask=None, dec_enc_attn_mask=None,
                 deterministic: bool = True):
        sa_out = self.self_attn(
            self.norm1(x), self.norm1(x), self.norm1(x), self_attn_mask, deterministic
        )
        x = x + sa_out
        ca_out = self.enc_attn(
            self.norm2(x), enc_output, enc_output, dec_enc_attn_mask, deterministic
        )
        x = x + ca_out
        x = x + self.mlp(self.norm3(x), deterministic)
        return x

    # ---- cached decode path -------------------------------------------------

    def prepare_cross_kv(self, enc_output):
        return self.enc_attn.project_kv(enc_output, enc_output)

    def decode_step(self, x_t, t, self_k, self_v, cross_k, cross_v):
        """One token step.  x_t [B, 1, C]; self_k/v [B, T, H, D] rolling
        caches; returns (out [B, 1, C], new_self_k, new_self_v)."""
        sa_in = self.norm1(x_t)
        q = self.self_attn.project_q(sa_in)
        k_new, v_new = self.self_attn.project_kv(sa_in, sa_in)
        self_k = jax.lax.dynamic_update_slice(self_k, k_new, (0, t, 0, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, v_new, (0, t, 0, 0))
        t_max = self_k.shape[1]
        mask = (jnp.arange(t_max) <= t)[None, None, None, :]
        sa_out = self.self_attn.attend(q, self_k, self_v, mask)
        x = x_t + sa_out
        cq = self.enc_attn.project_q(self.norm2(x))
        ca_out = self.enc_attn.attend(cq, cross_k, cross_v)
        x = x + ca_out
        x = x + self.mlp(self.norm3(x))
        return x, self_k, self_v


@dataclasses.dataclass
class DecodeResult:
    probs: jnp.ndarray  # [B, T, num_classes] per-step softmax (greedy) or ones
    ids: jnp.ndarray  # [B, T] predicted ids


def beam_select(scores, logp, b, num_classes, eos):
    """One reference beam step: expand, top-k, kill EOS rows
    (models/decoder.py:288-307; the GRU head's TopKDecoder loop,
    models/attn_decoder.py:116-140, is the same selection).
    Returns (stored top_scores [b,k], flat predecessors [b*k],
    symbols [b*k], new scores [b*k])."""
    k = scores.shape[0] // b
    cand = (scores[:, None] + logp).reshape(b, k * num_classes)
    top_scores, top_idx = jax.lax.top_k(cand, k)
    sym = (top_idx % num_classes).astype(jnp.int32).reshape(-1)
    pred = (top_idx // num_classes
            + jnp.arange(b)[:, None] * k).reshape(-1)
    new_scores = jnp.where(sym == eos, -jnp.inf, top_scores.reshape(-1))
    return top_scores, pred, sym, new_scores


def beam_backtrack(st_scores, st_preds, st_syms, b: int, k: int, eos: int):
    """Jitted port of the reference's backtracking
    (models/decoder.py:313-370 == models/attn_decoder.py:143-200):
    completed hypotheses (EOS emissions) replace the lowest-ranked final
    beams in a per-sample ring, walking time backwards; returns the best
    hypothesis ids [b, T].

    st_scores [T, b, k] are the post-top-k, pre-kill scores;
    st_preds / st_syms [T, b*k] flat predecessor indices and symbols."""
    t_max = st_scores.shape[0]
    pos = jnp.arange(b) * k
    sorted_score, sorted_idx = jax.lax.top_k(st_scores[-1], k)  # [b, k]
    t_pred = (sorted_idx + pos[:, None]).reshape(-1)
    rows = jnp.arange(b)

    def body(carry, xs):
        t_pred, s, count = carry
        scores_t, preds_t, syms_t, t = xs
        cur = syms_t[t_pred]
        new_pred = preds_t[t_pred]
        # this step's EOS emissions, processed in decreasing beam order
        # (the reference walks eos_indices back-to-front, :336-358)
        for j in range(k - 1, -1, -1):
            flat = pos + j
            is_eos = syms_t[flat] == eos
            res_k = k - 1 - (count % k)
            res_flat = pos + res_k
            new_pred = new_pred.at[res_flat].set(
                jnp.where(is_eos, preds_t[flat], new_pred[res_flat]))
            cur = cur.at[res_flat].set(
                jnp.where(is_eos, eos, cur[res_flat]))
            s = s.at[rows, res_k].set(
                jnp.where(is_eos, scores_t[rows, j], s[rows, res_k]))
            count = count + is_eos.astype(jnp.int32)
        return (new_pred, s, count), cur

    (_, s, _), syms_back = jax.lax.scan(
        body,
        (t_pred, sorted_score, jnp.zeros((b,), jnp.int32)),
        (st_scores[::-1], st_preds[::-1], st_syms[::-1],
         jnp.arange(t_max)[::-1]),
    )
    best_flat = pos + jnp.argmax(s, axis=1)  # ties -> lowest index, like topk
    return syms_back[::-1][:, best_flat].T  # [b, T]


class TFDecoder(nn.Module):
    """Transformer decoder with teacher-forced training and KV-cached
    greedy/beam inference."""

    num_classes: int = 97
    n_layers: int = 6
    d_embedding: int = 512
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 256
    n_position: int = 200
    dropout: float = 0.1
    max_seq_len: int = 25
    text_cond_vis: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def start_idx(self) -> int:
        return self.num_classes  # BOS id, one past the vocabulary

    def setup(self):
        self.trg_word_emb = nn.Embed(
            self.num_classes + 1, self.d_embedding,
            embedding_init=nn.initializers.normal(stddev=1.0), dtype=self.dtype,
        )
        self.position_table = sinusoid_position_table(self.n_position, self.d_embedding)
        self.dropout_layer = nn.Dropout(self.dropout)
        self.layer_stack = [
            TransformerDecoderLayer(
                d_model=self.d_model, d_inner=self.d_inner, n_head=self.n_head,
                d_k=self.d_k, d_v=self.d_v, dropout=self.dropout,
                text_cond_vis=self.text_cond_vis, dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.layer_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    # ---- shared -------------------------------------------------------------

    def _embed(self, trg_seq, deterministic: bool = True):
        emb = self.trg_word_emb(trg_seq)
        pos = jnp.asarray(self.position_table[:, : trg_seq.shape[1]], emb.dtype)
        return self.dropout_layer(emb + pos, deterministic=deterministic)

    def _run_layers(self, tgt, enc_output, self_attn_mask, deterministic: bool = True):
        x = tgt
        for layer in self.layer_stack:
            x = layer(x, enc_output, self_attn_mask, None, deterministic)
        return self.layer_norm(x)

    # ---- training -----------------------------------------------------------

    def __call__(self, enc_output, targets, tgt_lens, deterministic: bool = False):
        """Teacher-forced pass (reference: models/decoder.py:196-222):
        queries are [BOS] + targets shifted right; returns [B, T, C] logits."""
        b, t = targets.shape
        bos = jnp.full((b, 1), self.start_idx, dtype=targets.dtype)
        query = jnp.concatenate([bos, targets], axis=-1)[:, :-1]
        mask = make_pad_mask(tgt_lens, t) & make_causal_mask(t)  # [B, L, L]
        mask = mask[:, None, :, :]
        tgt = self._embed(query, deterministic)
        out = self._run_layers(tgt, enc_output, mask, deterministic)
        return self.classifier(out)

    # ---- greedy decode (KV-cached scan) --------------------------------------

    def _init_caches(self, batch: int, t_max: int, dtype):
        shapes = []
        for _ in range(self.n_layers):
            k = jnp.zeros((batch, t_max, self.n_head, self.d_k), dtype)
            v = jnp.zeros((batch, t_max, self.n_head, self.d_v), dtype)
            shapes.append((k, v))
        return shapes

    def decode_step(self, tokens_t, t, self_caches, cross_kvs):
        """One greedy step.  tokens_t [B] int ids; returns per-class softmax
        and updated caches."""
        x = self.trg_word_emb(tokens_t[:, None])
        pos = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(self.position_table, x.dtype), t, 1, axis=1
        )
        x = x + pos
        new_caches = []
        for layer, (sk, sv), (ck, cv) in zip(self.layer_stack, self_caches, cross_kvs):
            x, sk, sv = layer.decode_step(x, t, sk, sv, ck, cv)
            new_caches.append((sk, sv))
        x = self.layer_norm(x)
        logits = self.classifier(x[:, 0])
        return logits, new_caches

    def prepare_cross(self, enc_output):
        return [layer.prepare_cross_kv(enc_output) for layer in self.layer_stack]

    def greedy_decode(self, enc_output):
        """[B, N, C] encoder map -> per-step softmax [B, T, num_classes] and
        greedy ids, matching forward_test semantics
        (models/decoder.py:224-252) with a KV-cached scan."""
        if self.text_cond_vis:
            # FiLM-conditioned cross K/V depend on the query token, so
            # there is nothing to cache — use the full-recompute path
            # (exactly the reference's forward_test structure).
            return self.greedy_decode_dense(enc_output)
        b = enc_output.shape[0]
        t_max = self.max_seq_len
        cross_kvs = self.prepare_cross(enc_output)
        caches = self._init_caches(b, t_max, enc_output.dtype)

        def body(carry, t):
            tokens, caches = carry
            logits, caches = self.decode_step(tokens, t, caches, cross_kvs)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(probs, axis=-1).astype(tokens.dtype)
            return (nxt, caches), (probs, nxt)

        bos = jnp.full((b,), self.start_idx, dtype=jnp.int32)
        (_, _), (probs, ids) = jax.lax.scan(body, (bos, caches), jnp.arange(t_max))
        probs = probs.transpose(1, 0, 2)  # [B, T, C]
        ids = ids.transpose(1, 0)
        return probs, ids

    def _run_layers_cached_cross(self, tgt, cross_kvs, self_attn_mask,
                                 deterministic: bool = True):
        """Full-width decoder pass with precomputed cross K/V."""
        x = tgt
        for layer, (ck, cv) in zip(self.layer_stack, cross_kvs):
            sa_in = layer.norm1(x)
            x = x + layer.self_attn(sa_in, sa_in, sa_in, self_attn_mask, deterministic)
            cq = layer.enc_attn.project_q(layer.norm2(x))
            x = x + layer.enc_attn.attend(cq, ck, cv, None, deterministic)
            x = x + layer.mlp(layer.norm3(x), deterministic)
        return self.layer_norm(x)

    def greedy_decode_dense(self, enc_output, eos: Optional[int] = None):
        """Greedy decode that re-runs the decoder on the FULL prefix each
        step (the reference's inference structure, models/decoder.py:233-247)
        — but jitted as a loop with precomputed cross K/V.

        On TPU this beats the token-at-a-time KV cache for this model
        geometry: T is tiny (25) so per-step FLOPs stay negligible while
        the per-step tensors keep MXU-friendly [B*T, C] shapes instead of
        [B, 1, C] slivers; HBM traffic (dominated by re-reading the cross
        K/V each step) is identical.  Outputs match `greedy_decode`
        exactly (causal masking makes position t independent of future
        tokens).

        When `eos` is given, the loop terminates as soon as every sequence
        in the batch has emitted EOS (a `lax.while_loop`); positions at or
        before each sequence's first EOS are identical to the fixed-length
        run and later positions are never read by the metrics.  Real text
        averages ~7 steps of 25 — a ~2-3x inference speedup the reference
        cannot express (its loop is a fixed Python range;
        models/decoder.py:233)."""
        b = enc_output.shape[0]
        t_max = self.max_seq_len
        causal = make_causal_mask(t_max)[:, None]  # [1, 1, T, T]
        if self.text_cond_vis:
            run = lambda tgt: self._run_layers(tgt, enc_output, causal, True)
        else:
            cross_kvs = self.prepare_cross(enc_output)
            run = lambda tgt: self._run_layers_cached_cross(tgt, cross_kvs, causal)

        def step(t, tokens):
            tgt = self._embed(tokens[:, :-1], True)
            out = run(tgt)
            logits_t = self.classifier(
                jax.lax.dynamic_slice_in_dim(out, t, 1, axis=1)[:, 0]
            )
            probs = jax.nn.softmax(logits_t.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(probs, axis=-1).astype(tokens.dtype)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
            return tokens, probs

        return self._dense_greedy_loop(step, b, eos)

    def _dense_greedy_loop(self, step, b: int, eos):
        """Shared driver for the dense greedy decoders (vanilla and
        decoupled): `step(t, tokens) -> (tokens, probs_t)` is the
        per-step graph; this runs it as a fixed-length `lax.scan` when
        `eos` is None or an EOS early-exit `lax.while_loop` otherwise.

        CAVEAT (early exit): probability rows at steps past the global
        stop step stay zero-initialized — callers that feed `probs` into
        a loss must decode full-length (`eos=None`); callers that only
        read positions up to each row's own EOS (word accuracy, predict
        confidence) are exact either way."""
        t_max = self.max_seq_len
        tokens0 = jnp.zeros((b, t_max + 1), jnp.int32).at[:, 0].set(self.start_idx)

        if eos is None:
            def body(tokens, t):
                tokens, probs = step(t, tokens)
                return tokens, probs

            tokens, probs = jax.lax.scan(body, tokens0, jnp.arange(t_max))
            return probs.transpose(1, 0, 2), tokens[:, 1:]

        probs0 = jnp.zeros((b, t_max, self.num_classes), jnp.float32)

        def cond(carry):
            t, tokens, probs, done = carry
            return (t < t_max) & ~done

        def body(carry):
            t, tokens, probs, _ = carry
            tokens, probs_t = step(t, tokens)
            probs = jax.lax.dynamic_update_slice(
                probs, probs_t[:, None, :], (0, t, 0)
            )
            emitted = jax.lax.dynamic_slice_in_dim(tokens, 1, t_max, axis=1)
            pos = jnp.arange(t_max)[None, :]
            has_eos = jnp.any((emitted == eos) & (pos <= t), axis=1)
            return t + 1, tokens, probs, jnp.all(has_eos)

        _, tokens, probs, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens0, probs0, jnp.bool_(False))
        )
        return probs, tokens[:, 1:]

    # ---- beam search ----------------------------------------------------------
    #
    # Reference-faithful semantics (models/decoder.py:254-370), pinned
    # numerically by tests/test_beam_parity.py:
    #   * length-unnormalized log-prob scores; each step expands all k
    #     beams over all classes and takes the per-sample top-k,
    #   * a beam that emits EOS is KILLED (score -> -inf) and its
    #     completed hypothesis is recovered by backtracking through the
    #     stored per-step predecessors/symbols/scores (:313-370),
    #   * the per-row token history is NOT reordered by predecessor
    #     during the forward loop — the reference updates only
    #     `init_target_seq[:, step+1]` (:309) — so row r's conditioning
    #     prefix is its own emission history while its score is inherited
    #     from the predecessor.  This is observable in the outputs, so it
    #     is reproduced here rather than "fixed".
    # A welcome consequence of the no-reorder rule: the KV caches stay
    # row-aligned, so the cached variant needs no cache gathering at all.

    def _beam_select(self, scores, logp, b, eos):
        return beam_select(scores, logp, b, self.num_classes, eos)

    def _beam_backtrack(self, st_scores, st_preds, st_syms, b: int, k: int,
                        eos: int):
        return beam_backtrack(st_scores, st_preds, st_syms, b, k, eos)

    def beam_search(self, enc_output, beam_width: int, eos: int = 94):
        """Jittable KV-cached beam search, reference-parity semantics (see
        section comment above).  Returns ids [B, T]."""
        if self.text_cond_vis:
            return self.beam_search_dense(enc_output, beam_width, eos)
        b, n, c = enc_output.shape
        k = beam_width
        enc = jnp.repeat(enc_output, k, axis=0)  # beams contiguous per sample
        cross_kvs = self.prepare_cross(enc)
        caches = self._init_caches(b * k, self.max_seq_len, enc.dtype)

        # only beam 0 of each sample is live at step 0
        scores = jnp.where(jnp.arange(b * k) % k == 0, 0.0, -jnp.inf)
        tokens = jnp.full((b * k,), self.start_idx, dtype=jnp.int32)

        def body(carry, t):
            tokens, scores, caches = carry
            logits, caches = self.decode_step(tokens, t, caches, cross_kvs)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            top_scores, pred, sym, scores = self._beam_select(scores, logp, b, eos)
            return (sym, scores, caches), (top_scores, pred, sym)

        (_, _, _), (st_scores, st_preds, st_syms) = jax.lax.scan(
            body, (tokens, scores, caches), jnp.arange(self.max_seq_len)
        )
        return self._beam_backtrack(st_scores, st_preds, st_syms, b, k, eos)

    def _dense_beam_loop(self, run, b: int, k: int, eos: int):
        """Shared full-prefix beam driver: reference select semantics
        (kill-on-EOS, no token reorder) + stored-predecessor backtracking.
        `run(tgt)` maps embedded queries [b*k, T, C] -> decoder outputs."""
        t_max = self.max_seq_len
        scores = jnp.where(jnp.arange(b * k) % k == 0, 0.0, -jnp.inf)
        tokens = jnp.zeros((b * k, t_max + 1), jnp.int32).at[:, 0].set(self.start_idx)

        def body(carry, t):
            tokens, scores = carry
            tgt = self._embed(tokens[:, :-1], True)
            out = run(tgt)
            logits = self.classifier(
                jax.lax.dynamic_slice_in_dim(out, t, 1, axis=1)[:, 0]
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            top_scores, pred, sym, scores = self._beam_select(scores, logp, b, eos)
            tokens = jax.lax.dynamic_update_slice(
                tokens, sym.reshape(-1, 1), (0, t + 1)
            )
            return (tokens, scores), (top_scores, pred, sym)

        (_, _), (st_scores, st_preds, st_syms) = jax.lax.scan(
            body, (tokens, scores), jnp.arange(t_max)
        )
        return self._beam_backtrack(st_scores, st_preds, st_syms, b, k, eos)

    def beam_search_dense(self, enc_output, beam_width: int, eos: int = 94):
        """Beam search via full-prefix recompute (same shape rationale as
        `greedy_decode_dense`; semantics identical to `beam_search`)."""
        b, n, c = enc_output.shape
        k = beam_width
        enc = jnp.repeat(enc_output, k, axis=0)
        causal = make_causal_mask(self.max_seq_len)[:, None]
        if self.text_cond_vis:
            run = lambda tgt: self._run_layers(tgt, enc, causal, True)
        else:
            cross_kvs = self.prepare_cross(enc)
            run = lambda tgt: self._run_layers_cached_cross(tgt, cross_kvs, causal)
        return self._dense_beam_loop(run, b, k, eos)


class TextConditionalMHA(nn.Module):
    """FiLM-modulated cross-attention: each text query produces per-key
    gamma/beta that modulate the visual keys/values before attention
    (reference `TextConditionalMultiHeadAttention`,
    models/transformer_layer.py:284-383; enabled by --text_cond_vis)."""

    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    dropout: float = 0.1
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        b, lq, _ = q.shape
        lk = k.shape[1]
        dim_k = self.n_head * self.d_k
        dim_v = self.n_head * self.d_v

        film = nn.Dense(2 * dim_k, dtype=self.dtype, name="gamma_decode")(q)
        gammas, betas = jnp.split(film[:, :, None, :], 2, axis=-1)  # [B,Lq,1,dk]
        gammas, betas = jnp.tanh(gammas), jnp.tanh(betas)
        cond = nn.LayerNorm(dtype=self.dtype, name="vis_norm")(
            nn.Dense(dim_k, dtype=self.dtype, name="vis_proj")(k)
        )[:, None]  # [B,1,Lk,dk]
        cond = gammas * cond + betas  # [B,Lq,Lk,dk]
        cond = k[:, None] + nn.LayerNorm(dtype=self.dtype, name="vis_cond_norm")(cond)

        qh = nn.Dense(dim_k, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_q")(q)
        kh = nn.Dense(dim_k, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_k")(cond)
        vh = nn.Dense(dim_v, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_v")(cond)
        qh = qh.reshape(b, lq, self.n_head, self.d_k)
        kh = kh.reshape(b, lq, lk, self.n_head, self.d_k)
        vh = vh.reshape(b, lq, lk, self.n_head, self.d_v)

        # per-query attention: [B, H, Lq, Lk]
        logits = jnp.einsum("bqhd,bqkhd->bhqk", qh * (self.d_k**-0.5), kh)
        logits = logits.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bqkhd->bqhd", weights, vh).reshape(b, lq, dim_v)
        out = nn.Dense(self.d_model, use_bias=self.qkv_bias, dtype=self.dtype, name="fc")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TextCondDecoderLayer(TransformerDecoderLayer):
    """Decoder layer whose cross-attention is text-conditional
    (convenience alias for TransformerDecoderLayer(text_cond_vis=True))."""

    text_cond_vis: bool = True


class Order2Cls(nn.Module):
    """MLP mapping an order-query feature to a distribution over classes
    (reference `mlp_order2cls_attn`, models/transformer_layer.py:157-163;
    the reference hard-codes 97 outputs — generalized here)."""

    d_inner: int
    num_classes: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.d_inner, dtype=self.dtype)(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class DecoupledTFDecoder(TFDecoder):
    """Position-query decoder: a learned order embedding queries the visual
    features; the resulting attention is mixed with class-query maps and a
    re-projected value stream, fused with the semantic self-attention path
    (reference: models/decoder.py:373-436 +
    models/transformer_layer.py:121-201).

    TPU-native observation: the vision branch depends only on the (fixed)
    order embedding, the encoder map and the class-query maps — never on
    the decoded tokens.  The reference recomputes it for all max_seq_len
    positions at EVERY greedy step (decoder.py:224-252 calls the decoupled
    `_attention` :415-436 per step); here it is computed ONCE per image and
    reused across the whole decode loop, which removes the dominant
    per-step cost while staying numerically identical."""

    def setup(self):
        super().setup()
        self.order_enc = nn.Embed(self.max_seq_len + 1, self.d_embedding,
                                  dtype=self.dtype)
        self.order_dropout = nn.Dropout(self.dropout)
        self.order2cls = [
            Order2Cls(d_inner=self.d_inner, num_classes=self.num_classes,
                      dropout=self.dropout, dtype=self.dtype,
                      name=f"order2cls_{i}")
            for i in range(self.n_layers)
        ]
        self.new_linear_v = [
            nn.Dense(self.n_head * self.d_v, use_bias=False, dtype=self.dtype,
                     name=f"new_linear_v_{i}")
            for i in range(self.n_layers)
        ]

    def _vision_branch(self, enc_output, cls_query_attn_maps, t_len,
                       deterministic: bool = True):
        """Per-layer token-independent vision-branch outputs, each [B, T, C]
        (reference: models/transformer_layer.py:180-194; each layer reads
        the SAME order embedding, not the previous layer's output)."""
        b = enc_output.shape[0]
        orders = jnp.arange(t_len)[None].repeat(b, axis=0)
        order_embed = self.order_dropout(self.order_enc(orders),
                                         deterministic=deterministic)
        nc = cls_query_attn_maps.shape[1]
        cls_maps = cls_query_attn_maps.reshape(b, nc, -1)  # [B, C, Lk]
        outs = []
        for i, layer in enumerate(self.layer_stack):
            # order embedding queries the encoder through the layer's
            # cross-attention (query normalized by the layer's norm2,
            # matching `order_embed_q = self.norm2(order_embed)`)
            oq = layer.norm2(order_embed)
            qp = layer.enc_attn.project_q(oq)
            kp, vp = layer.enc_attn.project_kv(enc_output, enc_output)
            order_attn_out = layer.enc_attn.attend(qp, kp, vp, None, deterministic)
            order_attn_out = order_attn_out + order_embed
            order2cls = jax.nn.softmax(
                self.order2cls[i](order_attn_out, deterministic).astype(jnp.float32),
                axis=-1,
            ).astype(enc_output.dtype)  # [B, T, num_cls]
            # mean-head attention map of the order query
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qp * (layer.enc_attn.d_k**-0.5), kp
            ).astype(jnp.float32)
            attn_maps = jax.nn.softmax(logits, axis=-1).mean(axis=1)
            attn_maps = attn_maps.astype(enc_output.dtype)
            order_attn = jnp.einsum("btc,bck->btk", order2cls, cls_maps) + attn_maps
            enc_v = self.new_linear_v[i](enc_output)
            outs.append(jnp.einsum("btk,bkc->btc", order_attn, enc_v))
        return outs

    def _decoupled_run(self, x, vision_outs, self_attn_mask,
                       deterministic: bool = True):
        """Semantics (token self-attn) + precomputed vision fusion
        (reference layer forward, models/transformer_layer.py:167-201)."""
        for layer, v_out in zip(self.layer_stack, vision_outs):
            sa_in = layer.norm1(x)
            x = x + layer.self_attn(sa_in, sa_in, sa_in, self_attn_mask, deterministic)
            x = x + v_out
            x = x + layer.mlp(layer.norm3(x), deterministic)
        return self.layer_norm(x)

    def decoupled_forward(self, enc_output, targets, tgt_lens,
                          cls_query_attn_maps, deterministic: bool = False):
        """Teacher-forced pass (reference forward_train,
        models/decoder.py:196-222 with the decoupled `_attention`)."""
        b, t = targets.shape
        bos = jnp.full((b, 1), self.start_idx, dtype=targets.dtype)
        query = jnp.concatenate([bos, targets], axis=-1)[:, :-1]
        mask = (make_pad_mask(tgt_lens, t) & make_causal_mask(t))[:, None]
        x = self._embed(query, deterministic)
        vision_outs = self._vision_branch(enc_output, cls_query_attn_maps, t,
                                          deterministic)
        x = self._decoupled_run(x, vision_outs, mask, deterministic)
        return self.classifier(x)

    def decoupled_greedy_decode(self, enc_output, cls_query_attn_maps,
                                eos: Optional[int] = None):
        """Greedy decode through the decoupled graph (reference forward_test
        models/decoder.py:224-252 + decoupled _attention :415-436).  Dense
        full-prefix recompute of the token branch; the vision branch is
        hoisted out of the loop (see class docstring).  Returns
        (per-step softmax [B, T, num_classes], ids [B, T])."""
        b = enc_output.shape[0]
        t_max = self.max_seq_len
        causal = make_causal_mask(t_max)[:, None]
        vision_outs = self._vision_branch(enc_output, cls_query_attn_maps, t_max)

        def step(t, tokens):
            tgt = self._embed(tokens[:, :-1], True)
            out = self._decoupled_run(tgt, vision_outs, causal)
            logits_t = self.classifier(
                jax.lax.dynamic_slice_in_dim(out, t, 1, axis=1)[:, 0]
            )
            probs = jax.nn.softmax(logits_t.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(probs, axis=-1).astype(tokens.dtype)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
            return tokens, probs

        return self._dense_greedy_loop(step, b, eos)

    def decoupled_beam_search(self, enc_output, cls_query_attn_maps,
                              beam_width: int, eos: int = 94):
        """Beam search through the decoupled graph.  The reference's
        `beam_search` (models/decoder.py:254-370) routes through the
        decoupled `_attention` (:415-436) with the SAME kill-on-EOS +
        stored-predecessor backtracking semantics as the vanilla decoder,
        so this shares `_dense_beam_loop` with `TFDecoder` — only the
        per-step graph (token self-attn + hoisted vision branch) differs.
        Pinned against a numpy port of the reference algorithm in
        tests/test_decoupled_textcond.py.  Returns ids [B, T]."""
        b, n, c = enc_output.shape
        k = beam_width
        enc = jnp.repeat(enc_output, k, axis=0)
        maps = jnp.repeat(cls_query_attn_maps, k, axis=0)
        causal = make_causal_mask(self.max_seq_len)[:, None]
        vision_outs = self._vision_branch(enc, maps, self.max_seq_len)
        run = lambda tgt: self._decoupled_run(tgt, vision_outs, causal)
        return self._dense_beam_loop(run, b, k, eos)


def create_decoder(decoder_name: str, num_classes: int, max_len: int,
                   dtype=jnp.float32,
                   text_cond_vis: bool = False) -> TFDecoder:
    """Decoder factory mirroring `create_decoder`
    (reference: models/decoder.py:13-73).  Decoder widths come from the
    `decoder_name` table alone; cross-attention input dims are lazily
    inferred from the encoder features at init (no encoder_dim knob —
    the reference's linear_norm bridge handles the width change,
    models/model_builder.py:85-88).  `text_cond_vis` swaps every
    layer's cross-attention for the FiLM-conditioned variant
    (reference: --text_cond_vis, run_class_finetuning.py:60 ->
    models/decoder.py:18 -> transformer_layer.py:76-87); the decoupled
    decoder ignores it, as the reference's decoupled layer stack does
    (models/decoder.py:409-412 rebuilds layers without the flag)."""
    common = dict(num_classes=num_classes, max_seq_len=max_len, dtype=dtype)
    if decoder_name == "decoupled_tf_decoder":
        return DecoupledTFDecoder(**common)
    common["text_cond_vis"] = text_cond_vis
    if decoder_name == "tf_decoder":
        return TFDecoder(**common)
    if decoder_name == "small_tf_decoder":
        return TFDecoder(
            n_layers=2, d_embedding=384, n_head=6, d_k=64, d_v=64,
            d_model=384, d_inner=192, **common,
        )
    if decoder_name in ("corres_tiny_tf_decoder", "corres_small_tf_decoder",
                        "corres_base_tf_decoder"):
        dim = {"corres_tiny_tf_decoder": 192, "corres_small_tf_decoder": 384,
               "corres_base_tf_decoder": 512}[decoder_name]
        return TFDecoder(
            n_layers=6, d_embedding=dim, n_head=8, d_model=dim, d_inner=dim * 4,
            d_k=dim // 8, d_v=dim // 8, **common,
        )
    raise KeyError(f"unknown decoder '{decoder_name}'")
