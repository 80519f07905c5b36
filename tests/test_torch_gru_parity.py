"""Numerical parity of the GRU additive-attention head with the
reference's PyTorch math.

Builds a minimal torch module implementing the reference
`AttentionRecognitionHead` forward exactly (additive attention
`tanh(sEmbed(state) + xEmbed(x)) -> wEmbed -> softmax`, context via bmm,
`GRU([y_emb, context])`, linear classifier; BOS = num_classes;
models/attn_decoder.py:11-279), converts its state dict with
`convert_torch_attn_head`, and checks the Flax `AttentionRecognitionHead`
reproduces teacher-forced logits and greedy ids.  The GRU bias merge
(torch's separate b_ih/b_hh vs flax's fused r/z biases) is exercised by
random nonzero biases.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dig_tpu.models.attn_decoder import AttentionRecognitionHead
from dig_tpu.utils.checkpoint import convert_torch_attn_head

NUM_CLASSES, S_DIM, ATT_DIM, X_DIM, T_MAX = 11, 24, 24, 16, 6
ENC_LEN = 10


class TorchAttnHead(tnn.Module):
    """Reference math (models/attn_decoder.py:203-279 + :36-76)."""

    def __init__(self):
        super().__init__()
        self.sEmbed = tnn.Linear(S_DIM, ATT_DIM)
        self.xEmbed = tnn.Linear(X_DIM, ATT_DIM)
        self.wEmbed = tnn.Linear(ATT_DIM, 1)
        self.tgt_embedding = tnn.Embedding(NUM_CLASSES + 1, ATT_DIM)
        self.gru = tnn.GRU(input_size=X_DIM + ATT_DIM, hidden_size=S_DIM,
                           batch_first=True)
        self.fc = tnn.Linear(S_DIM, NUM_CLASSES)

    def _step(self, x, state, y_prev):
        b, t, _ = x.shape
        s_proj = self.sEmbed(state.squeeze(0)).unsqueeze(1)
        score = self.wEmbed(torch.tanh(s_proj + self.xEmbed(x))).squeeze(-1)
        alpha = F.softmax(score, dim=1)
        context = torch.bmm(alpha.unsqueeze(1), x).squeeze(1)
        y_emb = self.tgt_embedding(y_prev.long())
        out, state = self.gru(torch.cat([y_emb, context], 1).unsqueeze(1), state)
        return self.fc(out.squeeze(1)), state

    def forward_train(self, x, targets):
        b = x.size(0)
        state = torch.zeros(1, b, S_DIM)
        outs = []
        for i in range(T_MAX):
            y_prev = (torch.full((b,), NUM_CLASSES, dtype=torch.long)
                      if i == 0 else targets[:, i - 1])
            out, state = self._step(x, state, y_prev)
            outs.append(out)
        return torch.stack(outs, dim=1)

    def sample(self, x):
        b = x.size(0)
        state = torch.zeros(1, b, S_DIM)
        probs, ids = [], []
        pred = torch.full((b,), NUM_CLASSES, dtype=torch.long)
        for i in range(T_MAX):
            out, state = self._step(x, state, pred)
            p = F.softmax(out, dim=1)
            pred = p.argmax(dim=1)
            probs.append(p)
            ids.append(pred)
        return torch.stack(probs, 1), torch.stack(ids, 1)

    def reference_style_state_dict(self, prefix="decoder."):
        p = prefix + "decoder."
        sd = {p + "attention_unit.sEmbed.weight": self.sEmbed.weight,
              p + "attention_unit.sEmbed.bias": self.sEmbed.bias,
              p + "attention_unit.xEmbed.weight": self.xEmbed.weight,
              p + "attention_unit.xEmbed.bias": self.xEmbed.bias,
              p + "attention_unit.wEmbed.weight": self.wEmbed.weight,
              p + "attention_unit.wEmbed.bias": self.wEmbed.bias,
              p + "tgt_embedding.weight": self.tgt_embedding.weight,
              p + "gru.weight_ih_l0": self.gru.weight_ih_l0,
              p + "gru.weight_hh_l0": self.gru.weight_hh_l0,
              p + "gru.bias_ih_l0": self.gru.bias_ih_l0,
              p + "gru.bias_hh_l0": self.gru.bias_hh_l0,
              p + "fc.weight": self.fc.weight,
              p + "fc.bias": self.fc.bias}
        return {k: v.detach().numpy() for k, v in sd.items()}


def _graft(dst, src, path=""):
    for k, v in src.items():
        assert k in dst, f"converted key {path}/{k} missing from flax tree"
        if isinstance(v, dict):
            _graft(dst[k], v, f"{path}/{k}")
        else:
            assert np.shape(dst[k]) == np.shape(v), (path, k)
            dst[k] = np.asarray(v, np.float32)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(5)
    thead = TorchAttnHead().eval()
    model = AttentionRecognitionHead(
        num_classes=NUM_CLASSES, s_dim=S_DIM, att_dim=ATT_DIM,
        max_len_labels=T_MAX)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, ENC_LEN, X_DIM)).astype(np.float32)
    targets = rng.integers(0, NUM_CLASSES, size=(3, T_MAX)).astype(np.int64)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(targets, jnp.int32))
    import copy
    params = copy.deepcopy(jax.device_get(variables["params"]))
    tree = convert_torch_attn_head(thead.reference_style_state_dict())
    _graft(params, tree)
    return thead, model, params, x, targets


def test_teacher_forced_logits_match(converted):
    thead, model, params, x, targets = converted
    with torch.no_grad():
        ref = thead.forward_train(torch.from_numpy(x),
                                  torch.from_numpy(targets)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(targets, jnp.int32))
    assert np.abs(np.asarray(out) - ref).max() < 2e-5


def test_greedy_ids_match(converted):
    thead, model, params, x, targets = converted
    with torch.no_grad():
        ref_probs, ref_ids = thead.sample(torch.from_numpy(x))
    probs, ids = model.apply({"params": params}, jnp.asarray(x),
                             method=model.sample)
    assert np.array_equal(np.asarray(ids), ref_ids.numpy())
    assert np.abs(np.asarray(probs) - ref_probs.numpy()).max() < 1e-5


def test_recognizer_routing_picks_gru_converter(converted):
    from dig_tpu.utils.checkpoint import convert_torch_recognizer

    thead, *_ = converted
    sd = thead.reference_style_state_dict()
    sd["encoder.norm.weight"] = np.ones(X_DIM, np.float32)
    sd["encoder.norm.bias"] = np.zeros(X_DIM, np.float32)
    tree = convert_torch_recognizer(sd)
    assert "gru" in tree["decoder"] and "s_embed" in tree["decoder"]
    assert tree["decoder"]["gru"]["ir"]["kernel"].shape == (X_DIM + ATT_DIM, S_DIM)


def reference_gru_beam(thead, x, k, eos):
    """Numpy/torch port of the reference GRU beam search — the IBM
    TopKDecoder loop (models/attn_decoder.py:84-200): per-sample
    contiguous beam inflation, GRU state re-gathered by predecessor
    (state.index_select(1, predecessors), :129), kill-on-EOS after
    storing the post-top-k scores, and the shared backtracking ring
    (reference_backtrack, identical to models/decoder.py:313-370)."""
    from test_beam_parity import reference_backtrack

    b = x.shape[0]
    rows = b * k
    C = NUM_CLASSES
    xk = torch.from_numpy(np.repeat(x, k, axis=0))
    pos_index = (np.arange(b) * k).reshape(-1, 1)
    state = torch.zeros(1, rows, S_DIM)
    scores = np.full((rows, 1), -np.inf)
    scores[::k] = 0.0
    y_prev = np.full((rows,), NUM_CLASSES, np.int64)
    st_scores, st_pred, st_sym = [], [], []
    with torch.no_grad():
        for _ in range(T_MAX):
            out, state = thead._step(xk, state, torch.from_numpy(y_prev))
            logp = torch.log_softmax(out, dim=1).numpy().astype(np.float64)
            sc = (scores + logp).reshape(b, -1)
            cand = np.argsort(-sc, axis=1, kind="stable")[:, :k]
            top = np.take_along_axis(sc, cand, 1)
            sym = (cand % C).reshape(rows)
            scores = top.reshape(rows, 1).copy()
            pred = (cand // C + pos_index).reshape(rows, 1)
            st_scores.append(scores.copy())
            scores[sym.reshape(-1, 1) == eos] = -np.inf
            st_pred.append(pred)
            st_sym.append(sym.copy())
            state = state[:, torch.from_numpy(pred.reshape(rows))]
            y_prev = sym
    return reference_backtrack(st_scores, st_pred, st_sym, b, k, eos)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_beam_ids_match_reference(converted, k):
    """Flax GRU beam (kill-on-EOS + stored-predecessor backtracking) must
    match the reference TopKDecoder algorithm exactly."""
    from test_beam_parity import assert_beam_rows_match

    thead, model, params, x, _ = converted
    eos = 9
    ref = reference_gru_beam(thead, x, k, eos)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), k, eos,
                                 method=model.beam_search))
    assert_beam_rows_match(ref, got, eos=eos)


@pytest.mark.parametrize("k", [2, 3])
def test_gru_beam_eos_kill_parity(converted, k):
    """Kill-on-EOS + backtracking replacement ring, exercised for real: an
    EOS-biased copy of the head emits EOS mid-sequence, and the flax beam
    must still match the reference algorithm exactly."""
    from test_beam_parity import assert_beam_rows_match

    thead, model, params, x, _ = converted
    eos = 9
    import copy

    biased = copy.deepcopy(thead)
    with torch.no_grad():
        biased.fc.bias[eos] += 3.5
    ref = reference_gru_beam(biased, x, k, eos)
    assert (ref == eos).any(), "bias bump failed to produce EOS emissions"

    from dig_tpu.utils.checkpoint import convert_torch_attn_head

    bparams = copy.deepcopy(params)
    _graft(bparams, convert_torch_attn_head(biased.reference_style_state_dict()))
    got = np.asarray(model.apply({"params": bparams}, jnp.asarray(x), k, eos,
                                 method=model.beam_search))
    assert_beam_rows_match(ref, got, eos=eos)
