"""Decoder tests, most importantly KV-cached greedy decode parity with
full-prefix recompute (the reference's inference semantics,
models/decoder.py:224-252)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import TFDecoder, create_decoder
from dig_tpu.models.layers import make_causal_mask, make_pad_mask


def small_decoder(**kw):
    defaults = dict(num_classes=12, n_layers=2, d_embedding=16, n_head=2, d_k=8, d_v=8,
                    d_model=16, d_inner=32, max_seq_len=6, dropout=0.1)
    defaults.update(kw)
    return TFDecoder(**defaults)


@pytest.fixture(scope="module")
def dec_and_vars():
    dec = small_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 16))
    targets = jnp.zeros((3, 6), jnp.int32)
    lens = jnp.array([3, 4, 6])
    variables = dec.init(jax.random.PRNGKey(0), enc, targets, lens, deterministic=True)
    return dec, variables, enc


def test_train_logits_shape(dec_and_vars):
    dec, variables, enc = dec_and_vars
    targets = jnp.array([[1, 2, 11, 0, 0, 0]] * 3, jnp.int32)
    lens = jnp.array([3, 3, 3])
    logits = dec.apply(variables, enc, targets, lens, deterministic=True)
    assert logits.shape == (3, 6, 12)


def test_causality(dec_and_vars):
    """Changing a future target must not change earlier logits."""
    dec, variables, enc = dec_and_vars
    t1 = jnp.array([[1, 2, 3, 4, 5, 11]], jnp.int32)
    t2 = t1.at[0, 4].set(9)
    lens = jnp.array([6])
    l1 = dec.apply(variables, enc[:1], t1, lens, deterministic=True)
    l2 = dec.apply(variables, enc[:1], t2, lens, deterministic=True)
    # positions 0..4 read inputs [BOS, t0..t3] -> unchanged
    assert np.allclose(np.asarray(l1[:, :5]), np.asarray(l2[:, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, 5]), np.asarray(l2[:, 5]), atol=1e-5)


def _uncached_greedy(dec, variables, enc):
    """Reference-style greedy: re-run the full teacher-forced decoder on the
    growing prefix each step (models/decoder.py:233-247)."""
    b = enc.shape[0]
    seq = np.zeros((b, dec.max_seq_len + 1), np.int32)
    seq[:, 0] = dec.start_idx

    def full_pass(query, step):
        # replicate _attention on an explicit query sequence
        def run(mdl, query, enc_output, step):
            tgt = mdl._embed(query, deterministic=True)
            t = query.shape[1]
            lens = jnp.full((b,), step + 1, jnp.int32)
            mask = (make_pad_mask(lens, t) & make_causal_mask(t))[:, None]
            out = mdl._run_layers(tgt, enc_output, mask, deterministic=True)
            return mdl.classifier(out)

        return dec.apply(variables, jnp.asarray(query), enc, step, method=run)

    probs_all = []
    for step in range(dec.max_seq_len):
        logits = full_pass(seq[:, :-1], step)
        probs = jax.nn.softmax(logits[:, step].astype(jnp.float32), axis=-1)
        nxt = np.argmax(np.asarray(probs), axis=-1)
        seq[:, step + 1] = nxt
        probs_all.append(np.asarray(probs))
    return np.stack(probs_all, axis=1), seq[:, 1:]


def test_greedy_cached_matches_uncached(dec_and_vars):
    dec, variables, enc = dec_and_vars
    probs_c, ids_c = dec.apply(variables, enc, method=dec.greedy_decode)
    probs_u, ids_u = _uncached_greedy(dec, variables, enc)
    assert np.array_equal(np.asarray(ids_c), ids_u)
    # identical math, different op grouping -> small fp32 divergence
    assert np.allclose(np.asarray(probs_c), probs_u, atol=3e-3)


def test_greedy_dense_matches_cached(dec_and_vars):
    dec, variables, enc = dec_and_vars
    probs_c, ids_c = dec.apply(variables, enc, method=dec.greedy_decode)
    probs_d, ids_d = dec.apply(variables, enc, method=dec.greedy_decode_dense)
    assert np.array_equal(np.asarray(ids_c), np.asarray(ids_d))
    assert np.allclose(np.asarray(probs_c), np.asarray(probs_d), atol=3e-3)


@pytest.mark.slow
def test_greedy_jits(dec_and_vars):
    dec, variables, enc = dec_and_vars
    fn = jax.jit(lambda v, e: dec.apply(v, e, method=dec.greedy_decode))
    probs, ids = fn(variables, enc)
    assert probs.shape == (3, 6, 12) and ids.shape == (3, 6)


def test_beam_width1_matches_greedy(dec_and_vars):
    dec, variables, enc = dec_and_vars
    _, ids_g = dec.apply(variables, enc, method=dec.greedy_decode)
    eos = dec.num_classes - 3
    ids_b = dec.apply(variables, enc, 1, eos, method=dec.beam_search)
    g, bm = np.asarray(ids_g), np.asarray(ids_b)
    # beam-1 is argmax-chained like greedy until the first EOS freezes it
    for row_g, row_b in zip(g, bm):
        hits = np.where(row_g == eos)[0]
        stop = (hits[0] + 1) if len(hits) else len(row_g)
        assert np.array_equal(row_g[:stop], row_b[:stop])


def test_beam_search_wider(dec_and_vars):
    dec, variables, enc = dec_and_vars
    ids = dec.apply(variables, enc, 3, dec.num_classes - 3, method=dec.beam_search)
    assert ids.shape == (3, dec.max_seq_len)


def test_decoder_factory_variants():
    d = create_decoder("small_tf_decoder", num_classes=97, max_len=25)
    assert d.n_layers == 2 and d.d_model == 384
    d = create_decoder("corres_small_tf_decoder", num_classes=97, max_len=25)
    assert d.d_model == 384 and d.d_k == 48
    d = create_decoder("tf_decoder", num_classes=97, max_len=25)
    assert d.d_model == 512 and d.n_layers == 6


def test_greedy_dense_early_exit_matches(dec_and_vars):
    """Early-exit decode: identical ids/probs up to each sequence's first
    EOS; positions after global termination are never read by metrics."""
    dec, variables, enc = dec_and_vars
    eos = dec.num_classes - 3
    probs_f, ids_f = dec.apply(variables, enc, method=dec.greedy_decode_dense)
    probs_e, ids_e = dec.apply(variables, enc, eos, method=dec.greedy_decode_dense)
    f, e = np.asarray(ids_f), np.asarray(ids_e)
    for row_f, row_e in zip(f, e):
        hits = np.where(row_f == eos)[0]
        stop = (hits[0] + 1) if len(hits) else len(row_f)
        assert np.array_equal(row_f[:stop], row_e[:stop])


@pytest.mark.slow
def test_beam_dense_matches_cached_beam(dec_and_vars):
    dec, variables, enc = dec_and_vars
    eos = dec.num_classes - 3
    ids_c = dec.apply(variables, enc, 3, eos, method=dec.beam_search)
    ids_d = dec.apply(variables, enc, 3, eos, method=dec.beam_search_dense)
    assert np.array_equal(np.asarray(ids_c), np.asarray(ids_d))
