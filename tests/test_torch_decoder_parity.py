"""Numerical parity of the text decoder with the reference's PyTorch math.

Builds a minimal torch TFDecoder implementing the reference's exact
forward (separate q/k/v linears without bias, pre-LN decoder layers,
w_1/w_2 FFN, sinusoid positions, BOS = num_classes;
models/decoder.py:107-370 + models/transformer_layer.py:47-118, :204-281,
:386-432), runs it on random weights, converts the state_dict with
`convert_torch_decoder` / `convert_torch_recognizer`, and checks the Flax
decoder reproduces teacher-forced logits and greedy/beam ids.  Together
with tests/test_torch_parity.py (encoder) this pins a converted published
checkpoint end-to-end against reference torch math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dig_tpu.models.decoder import TFDecoder
from dig_tpu.models.layers import sinusoid_position_table
from dig_tpu.ops import activations
from dig_tpu.utils.checkpoint import (
    convert_torch_decoder,
    convert_torch_recognizer,
    has_decoder_keys,
)


@pytest.fixture(autouse=True)
def exact_gelu():
    old = activations.EXACT
    activations.EXACT = True
    yield
    activations.EXACT = old


NUM_CLASSES, N_LAYERS, D_MODEL, N_HEAD, D_K, D_INNER = 13, 2, 64, 2, 32, 48
T_MAX, N_POS, EOS = 7, 50, 10
ENC_LEN = 12


class TorchMHA(tnn.Module):
    """Reference MultiHeadAttention math (transformer_layer.py:204-281)."""

    def __init__(self):
        super().__init__()
        dim = N_HEAD * D_K
        self.linear_q = tnn.Linear(dim, dim, bias=False)
        self.linear_k = tnn.Linear(dim, dim, bias=False)
        self.linear_v = tnn.Linear(dim, dim, bias=False)
        self.fc = tnn.Linear(dim, D_MODEL, bias=False)

    def forward(self, q, k, v, mask=None):
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = self.linear_q(q).view(b, lq, N_HEAD, D_K).permute(0, 2, 1, 3)
        k = self.linear_k(k).view(b, lk, N_HEAD, D_K).permute(0, 2, 3, 1)
        v = self.linear_v(v).view(b, lk, N_HEAD, D_K).permute(0, 2, 1, 3)
        logits = torch.matmul(q, k) * (D_K ** -0.5)
        if mask is not None:
            if mask.dim() == 3:
                mask = mask.unsqueeze(1)
            logits = logits.masked_fill(mask == 0, float("-inf"))
        w = logits.softmax(dim=-1)
        out = torch.matmul(w, v).transpose(1, 2).reshape(b, lq, N_HEAD * D_K)
        return self.fc(out)


class TorchDecoderLayer(tnn.Module):
    """Pre-LN self-attn -> cross-attn -> FFN (transformer_layer.py:47-118)."""

    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(D_MODEL)
        self.norm2 = tnn.LayerNorm(D_MODEL)
        self.norm3 = tnn.LayerNorm(D_MODEL)
        self.self_attn = TorchMHA()
        self.enc_attn = TorchMHA()
        self.w_1 = tnn.Linear(D_MODEL, D_INNER)
        self.w_2 = tnn.Linear(D_INNER, D_MODEL)

    def forward(self, x, enc, self_mask):
        sa_in = self.norm1(x)
        x = x + self.self_attn(sa_in, sa_in, sa_in, self_mask)
        x = x + self.enc_attn(self.norm2(x), enc, enc, None)
        x = x + self.w_2(F.gelu(self.w_1(self.norm3(x))))
        return x


class TorchTFDecoder(tnn.Module):
    """Reference TFDecoder (models/decoder.py:107-370): char embedding over
    num_classes+1 (BOS last), sinusoid positions, teacher-forced train pass
    and the uncached greedy test loop."""

    def __init__(self):
        super().__init__()
        self.trg_word_emb = tnn.Embedding(NUM_CLASSES + 1, D_MODEL)
        self.layer_stack = tnn.ModuleList(
            [TorchDecoderLayer() for _ in range(N_LAYERS)])
        self.layer_norm = tnn.LayerNorm(D_MODEL, eps=1e-6)
        self.classifier = tnn.Linear(D_MODEL, NUM_CLASSES)
        pos = sinusoid_position_table(N_POS, D_MODEL)
        self.register_buffer("pos", torch.from_numpy(np.asarray(pos, np.float32)))

    def _attention(self, trg_seq, tgt_lens, enc):
        x = self.trg_word_emb(trg_seq) + self.pos[:, : trg_seq.size(1)]
        t = trg_seq.size(1)
        pad = (torch.arange(t)[None, :] < tgt_lens[:, None]).unsqueeze(1)  # [B,1,L]
        causal = torch.tril(torch.ones(t, t, dtype=torch.bool))[None]  # [1,L,L]
        mask = pad & causal
        for layer in self.layer_stack:
            x = layer(x, enc, mask)
        return self.layer_norm(x)

    def forward_train(self, enc, targets, tgt_lens):
        bos = torch.full((enc.size(0), 1), NUM_CLASSES, dtype=targets.dtype)
        query = torch.cat([bos, targets], dim=-1)[:, :-1]
        return self.classifier(self._attention(query, tgt_lens, enc))

    def forward_test(self, enc):
        b = enc.size(0)
        seq = torch.zeros((b, T_MAX + 1), dtype=torch.long)
        seq[:, 0] = NUM_CLASSES
        outputs = []
        for step in range(T_MAX):
            lens = torch.full((b,), step + 1, dtype=torch.long)
            out = self._attention(seq[:, :-1], lens, enc)
            probs = F.softmax(self.classifier(out[:, step]), dim=-1)
            outputs.append(probs)
            seq[:, step + 1] = probs.argmax(dim=-1)
        return torch.stack(outputs, dim=1), seq[:, 1:]

    def reference_style_state_dict(self, prefix="decoder."):
        sd = {prefix + "trg_word_emb.weight": self.trg_word_emb.weight,
              prefix + "layer_norm.weight": self.layer_norm.weight,
              prefix + "layer_norm.bias": self.layer_norm.bias,
              prefix + "classifier.weight": self.classifier.weight,
              prefix + "classifier.bias": self.classifier.bias,
              prefix + "position_enc.position_table": self.pos}
        for i, layer in enumerate(self.layer_stack):
            p = f"{prefix}layer_stack.{i}."
            for n in ("norm1", "norm2", "norm3"):
                sd[p + n + ".weight"] = getattr(layer, n).weight
                sd[p + n + ".bias"] = getattr(layer, n).bias
            for attn in ("self_attn", "enc_attn"):
                for lin in ("linear_q", "linear_k", "linear_v", "fc"):
                    sd[p + f"{attn}.{lin}.weight"] = getattr(
                        getattr(layer, attn), lin).weight
            sd[p + "mlp.w_1.weight"] = layer.w_1.weight
            sd[p + "mlp.w_1.bias"] = layer.w_1.bias
            sd[p + "mlp.w_2.weight"] = layer.w_2.weight
            sd[p + "mlp.w_2.bias"] = layer.w_2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def _flax_decoder():
    return TFDecoder(num_classes=NUM_CLASSES, n_layers=N_LAYERS,
                     d_embedding=D_MODEL, n_head=N_HEAD, d_k=D_K, d_v=D_K,
                     d_model=D_MODEL, d_inner=D_INNER, n_position=N_POS,
                     dropout=0.0, max_seq_len=T_MAX)


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
    torch.manual_seed(1)
    tdec = TorchTFDecoder().eval()
    model = _flax_decoder()
    rng = np.random.default_rng(2)
    enc = rng.normal(size=(3, ENC_LEN, D_MODEL)).astype(np.float32) * 0.5
    targets = rng.integers(0, NUM_CLASSES, size=(3, T_MAX)).astype(np.int64)
    lens = np.array([3, T_MAX, 5], np.int64)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), True)
    import copy
    params = copy.deepcopy(jax.device_get(variables["params"]))
    tree = convert_torch_decoder(tdec.reference_style_state_dict())
    _graft(params, tree)
    return tdec, model, params, enc, targets, lens


def test_teacher_forced_logits_match(converted):
    tdec, model, params, enc, targets, lens = converted
    with torch.no_grad():
        ref = tdec.forward_train(torch.from_numpy(enc),
                                 torch.from_numpy(targets),
                                 torch.from_numpy(lens)).numpy()
    out = model.apply({"params": params}, jnp.asarray(enc),
                      jnp.asarray(targets, jnp.int32),
                      jnp.asarray(lens, jnp.int32), True)
    assert np.abs(np.asarray(out) - ref).max() < 2e-4


def test_greedy_ids_match(converted):
    tdec, model, params, enc, targets, lens = converted
    with torch.no_grad():
        ref_probs, ref_ids = tdec.forward_test(torch.from_numpy(enc))
    for method in ("greedy_decode", "greedy_decode_dense"):
        probs, ids = model.apply({"params": params}, jnp.asarray(enc),
                                 method=getattr(model, method))
        assert np.array_equal(np.asarray(ids), ref_ids.numpy()), method
        assert np.abs(np.asarray(probs) - ref_probs.numpy()).max() < 1e-4, method


def test_beam1_matches_torch_greedy(converted):
    tdec, model, params, enc, targets, lens = converted
    with torch.no_grad():
        _, ref_ids = tdec.forward_test(torch.from_numpy(enc))
    ids = model.apply({"params": params}, jnp.asarray(enc), 1, EOS,
                      method=model.beam_search)
    ref = ref_ids.numpy().copy()
    # beam backtracking reports the completed hypothesis: positions after
    # the first EOS are not comparable
    out = np.asarray(ids)
    for r in range(ref.shape[0]):
        eos_pos = np.where(ref[r] == EOS)[0]
        n = eos_pos[0] + 1 if len(eos_pos) else ref.shape[1]
        assert np.array_equal(out[r, :n], ref[r, :n])


def test_full_recognizer_conversion_routes_all_parts(converted):
    tdec, model, params, enc, targets, lens = converted
    sd = tdec.reference_style_state_dict()
    # splice in linear_norm + a fake encoder tensor to exercise routing
    sd["linear_norm.0.weight"] = np.eye(D_MODEL, dtype=np.float32)
    sd["linear_norm.0.bias"] = np.zeros(D_MODEL, np.float32)
    sd["linear_norm.1.weight"] = np.ones(D_MODEL, np.float32)
    sd["linear_norm.1.bias"] = np.zeros(D_MODEL, np.float32)
    sd["encoder.norm.weight"] = np.ones(D_MODEL, np.float32)
    sd["encoder.norm.bias"] = np.zeros(D_MODEL, np.float32)
    assert has_decoder_keys(sd)
    tree = convert_torch_recognizer(sd)
    assert set(tree) == {"encoder", "linear_norm", "decoder"}
    assert tree["linear_norm"]["dense"]["kernel"].shape == (D_MODEL, D_MODEL)
    assert tree["encoder"]["norm"]["scale"].shape == (D_MODEL,)
    assert "layers_0" in tree["decoder"] and "layers_1" in tree["decoder"]
    assert tree["decoder"]["classifier"]["kernel"].shape == (D_MODEL, NUM_CLASSES)
