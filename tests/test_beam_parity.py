"""Numerical beam-search parity against a test-local numpy port of the
reference algorithm (/root/reference/models/decoder.py:254-370): stored
per-step predecessors/symbols/scores, kill-on-EOS, backtracking with the
completed-hypothesis replacement ring, and the reference's no-reorder
token-history artifact (only `init_target_seq[:, step+1]` is written,
:309).  The repo implementation must match ids exactly for
beam_width in {1, 2, 3}, including EOS-kill cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import TFDecoder
from dig_tpu.models.layers import make_causal_mask, make_pad_mask

pytestmark = pytest.mark.slow

EOS = 9
B, N, T, C = 4, 20, 6, 12


@pytest.fixture(scope="module")
def setup():
    dec = TFDecoder(num_classes=C, n_layers=2, d_embedding=16, n_head=2,
                    d_k=8, d_v=8, d_model=16, d_inner=32, max_seq_len=T,
                    dropout=0.0)
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, N, 16))
    variables = dec.init(jax.random.PRNGKey(0), enc, jnp.zeros((B, T), jnp.int32),
                         jnp.full((B,), T), deterministic=True)
    return dec, variables, enc


def _step_logits(dec, variables, enc_rows, tokens, step):
    """Reference `_attention` + classifier[:, step]: full-sequence pass with
    a (pad & causal) mask at tgt_lens = step+1 (models/decoder.py:224-247)."""

    def run(mdl, tokens, enc_output, step):
        tgt = mdl._embed(tokens, deterministic=True)
        t = tokens.shape[1]
        lens = jnp.full((tokens.shape[0],), step + 1, jnp.int32)
        mask = (make_pad_mask(lens, t) & make_causal_mask(t))[:, None]
        out = mdl._run_layers(tgt, enc_output, mask, deterministic=True)
        return mdl.classifier(out)[:, step]

    return np.asarray(
        dec.apply(variables, jnp.asarray(tokens), enc_rows, step, method=run)
    ).astype(np.float64)


def _logsoftmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def generic_reference_beam(step_logits, start_idx, b, t_max, num_classes, k,
                           eos):
    """Line-for-line numpy port of the reference beam search
    (models/decoder.py:254-370), generic over the per-step logits function
    (`step_logits(seq, step) -> [rows, num_classes]`) so the decoupled
    decoder graph can be pinned with the same algorithm
    (tests/test_decoupled_textcond.py)."""
    B, T, C = b, t_max, num_classes
    rows = B * k
    seq = np.zeros((rows, T + 1), np.int64)
    seq[:, 0] = start_idx
    pos_index = (np.arange(B) * k).reshape(-1, 1)
    scores = np.full((rows, 1), -np.inf)
    scores[::k] = 0.0
    st_scores, st_pred, st_sym = [], [], []
    for step in range(T):
        logp = _logsoftmax(step_logits(seq, step))
        sc = (scores + logp).reshape(B, -1)
        cand = np.argsort(-sc, axis=1, kind="stable")[:, :k]  # topk, stable ties
        top = np.take_along_axis(sc, cand, 1)
        sym = (cand % C).reshape(rows)
        scores = top.reshape(rows, 1).copy()
        pred = (cand // C + pos_index).reshape(rows, 1)
        st_scores.append(scores.copy())
        scores[sym.reshape(-1, 1) == eos] = -np.inf  # kill completed beams
        st_pred.append(pred)
        st_sym.append(sym.copy())
        seq[:, step + 1] = sym  # note: NO predecessor reorder (reference :309)
    return reference_backtrack(st_scores, st_pred, st_sym, B, k, eos)


def reference_backtrack(st_scores, st_pred, st_sym, B, k, eos):
    """Numpy port of the reference backtracking (models/decoder.py:313-370,
    identical in the GRU head's TopKDecoder, models/attn_decoder.py:143-200):
    completed hypotheses replace the lowest-ranked final beams in a
    per-sample ring, walking time backwards."""
    rows = B * k
    pos_index = (np.arange(B) * k).reshape(-1, 1)
    T = len(st_sym)
    p = []
    last = st_scores[-1].reshape(B, k)
    sorted_idx = np.argsort(-last, axis=1, kind="stable")
    s = np.take_along_axis(last, sorted_idx, 1).copy()
    batch_eos_found = [0] * B
    t_pred = (sorted_idx + pos_index).reshape(rows)
    for t in range(T - 1, -1, -1):
        cur = st_sym[t][t_pred]
        t_pred = st_pred[t][t_pred].reshape(rows)
        for idx in np.nonzero(st_sym[t] == eos)[0][::-1]:
            b_idx = idx // k
            res_k = k - (batch_eos_found[b_idx] % k) - 1
            batch_eos_found[b_idx] += 1
            res = b_idx * k + res_k
            t_pred[res] = st_pred[t][idx, 0]
            cur[res] = st_sym[t][idx]
            s[b_idx, res_k] = st_scores[t][idx, 0]
        p.append(cur.copy())
    re_idx = np.argsort(-s, axis=1, kind="stable")
    re_flat = (re_idx + pos_index).reshape(rows)
    p = [x[re_flat].reshape(B, k, 1) for x in reversed(p)]
    return np.concatenate(p, -1)[:, 0, :]


def reference_beam(dec, variables, enc, k, eos=EOS):
    """Numpy reference beam over the vanilla TFDecoder graph."""
    enc_rows = jnp.repeat(enc, k, axis=0)
    return generic_reference_beam(
        lambda seq, step: _step_logits(dec, variables, enc_rows, seq, step),
        dec.start_idx, B, T, C, k, eos)


def assert_beam_rows_match(ref, got, eos=EOS):
    """Compare up to and including each row's first EOS: positions after a
    completed hypothesis's EOS are backtracking residue in both
    implementations and are never read by the metrics."""
    for row_ref, row_got in zip(ref, got):
        hits = np.where(row_ref == eos)[0]
        stop = hits[0] + 1 if len(hits) else len(row_ref)
        assert np.array_equal(row_ref[:stop], row_got[:stop]), (ref, got)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_beam_ids_match_reference(setup, k):
    dec, variables, enc = setup
    ref = reference_beam(dec, variables, enc, k)
    got = np.asarray(dec.apply(variables, enc, k, EOS, method=dec.beam_search))
    assert_beam_rows_match(ref, got)


@pytest.mark.parametrize("k", [2, 3])
def test_beam_dense_matches_reference(setup, k):
    dec, variables, enc = setup
    ref = reference_beam(dec, variables, enc, k)
    got = np.asarray(
        dec.apply(variables, enc, k, EOS, method=dec.beam_search_dense)
    )
    assert_beam_rows_match(ref, got)


def test_eos_kill_case_is_exercised(setup):
    """The fixture weights must actually produce EOS terminations so the
    backtracking pool path is covered (not just the final-beam path)."""
    dec, variables, enc = setup
    ref = reference_beam(dec, variables, enc, 2)
    assert (ref == EOS).any()
