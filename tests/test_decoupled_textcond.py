"""Inference coverage for the decoupled decoder and the text-conditional
cross-attention decoder (VERDICT round-1 items 3 & 4):

* decoupled greedy == decoupled teacher-forced argmax on the emitted
  prefix (the analogue of the cached==dense test; reference
  models/decoder.py:224-252 routed through the decoupled `_attention`
  :415-436),
* decoupled beam_width=1 == decoupled greedy (up to EOS),
* SeqClsRecModel.recognize works for both greedy and beam,
* text_cond_vis decoders train, greedy-decode (cached entry point
  delegates to dense), and beam-decode consistently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.models.decoder import DecoupledTFDecoder, create_decoder
from dig_tpu.models.rec_model import SeqClsRecModel, build_rec_model

C, T = 12, 5
EOS = 9


@pytest.fixture(scope="module")
def decoupled():
    dec = DecoupledTFDecoder(num_classes=C, n_layers=2, d_embedding=32, n_head=2,
                             d_k=16, d_v=16, d_model=32, d_inner=64,
                             max_seq_len=T, dropout=0.0)
    enc = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 32))
    cls_maps = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (3, C, 10)))
    targets = jnp.zeros((3, T), jnp.int32)
    lens = jnp.array([3, T, 4])
    variables = dec.init(jax.random.PRNGKey(2), enc, targets, lens, cls_maps, True,
                         method=dec.decoupled_forward)
    return dec, variables, enc, cls_maps


def test_decoupled_greedy_matches_teacher_forced(decoupled):
    dec, variables, enc, cls_maps = decoupled
    probs, ids = dec.apply(variables, enc, cls_maps,
                           method=dec.decoupled_greedy_decode)
    assert probs.shape == (3, T, C) and ids.shape == (3, T)
    # teacher-forcing the greedy ids must reproduce them as per-step argmax
    tf_logits = dec.apply(variables, enc, ids, jnp.full((3,), T), cls_maps, True,
                          method=dec.decoupled_forward)
    assert np.array_equal(np.argmax(np.asarray(tf_logits), -1), np.asarray(ids))
    # probs are the softmax of those logits
    tf_probs = jax.nn.softmax(tf_logits.astype(jnp.float32), axis=-1)
    assert np.allclose(np.asarray(probs), np.asarray(tf_probs), atol=3e-3)


@pytest.mark.slow
def test_decoupled_greedy_early_exit_matches(decoupled):
    dec, variables, enc, cls_maps = decoupled
    _, ids_f = dec.apply(variables, enc, cls_maps,
                         method=dec.decoupled_greedy_decode)
    _, ids_e = dec.apply(variables, enc, cls_maps, EOS,
                         method=dec.decoupled_greedy_decode)
    for row_f, row_e in zip(np.asarray(ids_f), np.asarray(ids_e)):
        hits = np.where(row_f == EOS)[0]
        stop = hits[0] + 1 if len(hits) else len(row_f)
        assert np.array_equal(row_f[:stop], row_e[:stop])


@pytest.mark.slow
def test_decoupled_beam1_matches_greedy(decoupled):
    dec, variables, enc, cls_maps = decoupled
    _, ids_g = dec.apply(variables, enc, cls_maps,
                         method=dec.decoupled_greedy_decode)
    ids_b = dec.apply(variables, enc, cls_maps, 1, EOS,
                      method=dec.decoupled_beam_search)
    for row_g, row_b in zip(np.asarray(ids_g), np.asarray(ids_b)):
        hits = np.where(row_g == EOS)[0]
        stop = hits[0] + 1 if len(hits) else len(row_g)
        assert np.array_equal(row_g[:stop], row_b[:stop])


@pytest.mark.slow
def test_decoupled_beam_wider_shape(decoupled):
    dec, variables, enc, cls_maps = decoupled
    ids = dec.apply(variables, enc, cls_maps, 3, EOS,
                    method=dec.decoupled_beam_search)
    assert ids.shape == (3, T)


def _decoupled_step_logits(dec, variables, enc_rows, maps_rows, seq, step):
    """Reference decoupled `_attention` + classifier[:, step]: full-sequence
    pass with a (pad & causal) mask at tgt_lens = step+1 (the reference's
    forward_test/beam_search loop, models/decoder.py:224-370, routed
    through the decoupled graph :415-436)."""
    from dig_tpu.models.layers import make_causal_mask, make_pad_mask

    def run(mdl, tokens, enc_output, cls_maps, step):
        tgt = mdl._embed(tokens, True)
        t = tokens.shape[1]
        lens = jnp.full((tokens.shape[0],), step + 1, jnp.int32)
        mask = (make_pad_mask(lens, t) & make_causal_mask(t))[:, None]
        vision_outs = mdl._vision_branch(enc_output, cls_maps, t)
        x = mdl._decoupled_run(tgt, vision_outs, mask, True)
        return mdl.classifier(x)[:, step]

    return np.asarray(
        dec.apply(variables, jnp.asarray(seq), enc_rows, maps_rows, step,
                  method=run)
    ).astype(np.float64)


@pytest.mark.slow
@pytest.mark.parametrize("k", [2, 3])
def test_decoupled_beam_ids_match_reference(decoupled, k):
    """Pin decoupled_beam_search against the numpy port of the reference
    algorithm (kill-on-EOS + stored-predecessor backtracking) routed
    through the decoupled graph — the round-2 freeze-on-EOS semantics
    diverged from the reference whenever a beam emitted EOS early."""
    from test_beam_parity import assert_beam_rows_match, generic_reference_beam

    dec, variables, enc, cls_maps = decoupled
    enc_rows = jnp.repeat(enc, k, axis=0)
    maps_rows = jnp.repeat(cls_maps, k, axis=0)
    ref = generic_reference_beam(
        lambda seq, step: _decoupled_step_logits(
            dec, variables, enc_rows, maps_rows, seq, step),
        dec.start_idx, enc.shape[0], T, C, k, EOS)
    got = np.asarray(dec.apply(variables, enc, cls_maps, k, EOS,
                               method=dec.decoupled_beam_search))
    assert_beam_rows_match(ref, got, eos=EOS)


@pytest.mark.slow
@pytest.mark.parametrize("k", [2, 3])
def test_decoupled_beam_eos_kill_matches_reference(decoupled, k):
    """Same parity check with the classifier biased toward EOS so beams
    terminate early — covers the kill + backtracking-pool path for the
    decoupled graph (asserted exercised)."""
    from test_beam_parity import assert_beam_rows_match, generic_reference_beam
    import flax

    dec, variables, enc, cls_maps = decoupled
    variables = flax.core.unfreeze(variables)
    bias = np.asarray(variables["params"]["classifier"]["bias"]).copy()
    bias[EOS] += 3.0
    variables = {"params": {**variables["params"],
                            "classifier": {**variables["params"]["classifier"],
                                           "bias": jnp.asarray(bias)}}}
    enc_rows = jnp.repeat(enc, k, axis=0)
    maps_rows = jnp.repeat(cls_maps, k, axis=0)
    ref = generic_reference_beam(
        lambda seq, step: _decoupled_step_logits(
            dec, variables, enc_rows, maps_rows, seq, step),
        dec.start_idx, enc.shape[0], T, C, k, EOS)
    assert (ref[:, :-1] == EOS).any(), "fixture must terminate beams early"
    got = np.asarray(dec.apply(variables, enc, cls_maps, k, EOS,
                               method=dec.decoupled_beam_search))
    assert_beam_rows_match(ref, got, eos=EOS)


@pytest.mark.slow
def test_seq_cls_rec_model_recognize():
    model = build_rec_model(
        model_name="vit_micro_patch4_32x128", decoder_name="decoupled_tf_decoder",
        nb_classes=C, max_len=T, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0,
    )
    assert isinstance(model, SeqClsRecModel)
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 128, 3))
    targets = jnp.zeros((2, T), jnp.int32)
    lens = jnp.full((2,), T)
    v = model.init(jax.random.PRNGKey(1), images, targets, lens, True)
    logits, cls_logit, cls_maps = model.apply(v, images, targets, lens, True)
    assert logits.shape == (2, T, C)
    probs, ids = model.apply(v, images, 0, EOS, method=model.recognize)
    assert ids.shape == (2, T)
    _, ids_b = model.apply(v, images, 2, EOS, method=model.recognize)
    assert ids_b.shape == (2, T)


@pytest.fixture(scope="module")
def text_cond():
    dec = create_decoder("small_tf_decoder", C, T, dtype=jnp.float32,
                         text_cond_vis=True)
    enc = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 384))
    targets = jnp.zeros((2, T), jnp.int32)
    lens = jnp.full((2,), T)
    variables = dec.init(jax.random.PRNGKey(4), enc, targets, lens, True)
    return dec, variables, enc


def test_text_cond_greedy_matches_teacher_forced(text_cond):
    dec, variables, enc = text_cond
    assert dec.text_cond_vis
    probs, ids = dec.apply(variables, enc, method=dec.greedy_decode)
    tf_logits = dec.apply(variables, enc, ids, jnp.full((2,), T), True)
    assert np.array_equal(np.argmax(np.asarray(tf_logits), -1), np.asarray(ids))


@pytest.mark.slow
def test_text_cond_beam1_matches_greedy(text_cond):
    dec, variables, enc = text_cond
    _, ids_g = dec.apply(variables, enc, method=dec.greedy_decode)
    ids_b = dec.apply(variables, enc, 1, EOS, method=dec.beam_search)
    for row_g, row_b in zip(np.asarray(ids_g), np.asarray(ids_b)):
        hits = np.where(row_g == EOS)[0]
        stop = hits[0] + 1 if len(hits) else len(row_g)
        assert np.array_equal(row_g[:stop], row_b[:stop])


@pytest.mark.slow
def test_text_cond_params_differ_from_vanilla():
    """text_cond_vis swaps the cross-attention parameter structure
    (FiLM generator + vis projections), mirroring the reference's layer
    swap (transformer_layer.py:76-87)."""
    d_plain = create_decoder("small_tf_decoder", C, T)
    d_cond = create_decoder("small_tf_decoder", C, T, text_cond_vis=True)
    enc = jnp.zeros((1, 10, 384))
    tgt = jnp.zeros((1, T), jnp.int32)
    lens = jnp.full((1,), T)
    v_plain = d_plain.init(jax.random.PRNGKey(0), enc, tgt, lens, True)
    v_cond = d_cond.init(jax.random.PRNGKey(0), enc, tgt, lens, True)
    plain_keys = set(v_plain["params"]["layers_0"]["enc_attn"].keys())
    cond_keys = set(v_cond["params"]["layers_0"]["enc_attn"].keys())
    assert "gamma_decode" in cond_keys and "gamma_decode" not in plain_keys
