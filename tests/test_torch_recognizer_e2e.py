"""End-to-end numerical parity of a converted FULL recognizer.

Assembles the reference's complete finetuned-checkpoint layout in torch —
`encoder.*` (finetune ViT, modeling_finetune.py:213-366), `linear_norm.*`
(Sequential Linear+LayerNorm, models/model_builder.py:85-88) and
`decoder.*` (TFDecoder, models/decoder.py:107-370) — on random weights,
converts the whole state dict with `convert_torch_recognizer`, grafts it
onto a Flax `RecModel`, and checks teacher-forced logits and greedy ids
match the torch pipeline.  This is the path a published DiG_finetuned.pth
takes through ``--eval --finetune`` and pins it end-to-end against
reference torch math (closing the encoder-only gap: the component-level
tests cover the ViT and the decoder separately).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from dig_tpu.models.rec_model import RecModel
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.models.layers import sinusoid_position_table
from dig_tpu.ops import activations
from dig_tpu.utils.checkpoint import convert_torch_recognizer, has_decoder_keys

from tests.test_torch_parity import TorchBlock
from tests.test_torch_decoder_parity import (
    TorchTFDecoder,
    NUM_CLASSES, N_LAYERS, D_MODEL, N_HEAD, D_K, D_INNER, T_MAX, N_POS,
    _flax_decoder,
    _graft,
)


@pytest.fixture(autouse=True)
def exact_gelu():
    old = activations.EXACT
    activations.EXACT = True
    yield
    activations.EXACT = old


# encoder dims: match the decoder width so linear_norm is square (the
# real models differ — 384 -> 512 — but the math is dim-agnostic)
EMBED, DEPTH, HEADS = 64, 2, 2
IMG = (32, 128)
PATCH = 4
N_TOKENS = (IMG[0] // PATCH) * (IMG[1] // PATCH)


class TorchFtEncoder(tnn.Module):
    """Reference finetune `VisionTransformer` math: conv patch embed,
    sinusoid positions, pre-LN blocks, final LayerNorm (the
    use_mean_pooling=False feature-map path, modeling_finetune.py:354-355).
    No mask token — finetuned checkpoints carry none."""

    def __init__(self):
        super().__init__()
        self.patch = tnn.Conv2d(3, EMBED, kernel_size=PATCH, stride=PATCH)
        self.blocks = tnn.ModuleList([TorchBlock(EMBED, HEADS) for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(EMBED, eps=1e-6)
        pos = sinusoid_position_table(N_TOKENS, EMBED)
        self.register_buffer("pos", torch.from_numpy(np.asarray(pos, np.float32)))

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2) + self.pos
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def reference_style_state_dict(self, prefix="encoder."):
        sd = {prefix + "patch_embed.proj.weight": self.patch.weight,
              prefix + "patch_embed.proj.bias": self.patch.bias,
              prefix + "norm.weight": self.norm.weight,
              prefix + "norm.bias": self.norm.bias}
        for i, blk in enumerate(self.blocks):
            p = f"{prefix}blocks.{i}."
            sd[p + "attn.qkv.weight"] = blk.qkv.weight
            sd[p + "attn.q_bias"] = blk.q_bias
            sd[p + "attn.v_bias"] = blk.v_bias
            sd[p + "attn.proj.weight"] = blk.proj.weight
            sd[p + "attn.proj.bias"] = blk.proj.bias
            sd[p + "norm1.weight"] = blk.norm1.weight
            sd[p + "norm1.bias"] = blk.norm1.bias
            sd[p + "norm2.weight"] = blk.norm2.weight
            sd[p + "norm2.bias"] = blk.norm2.bias
            sd[p + "mlp.fc1.weight"] = blk.fc1.weight
            sd[p + "mlp.fc1.bias"] = blk.fc1.bias
            sd[p + "mlp.fc2.weight"] = blk.fc2.weight
            sd[p + "mlp.fc2.bias"] = blk.fc2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


class TorchRecognizer(tnn.Module):
    """encoder -> linear_norm -> TFDecoder (models/model_builder.py:74-202)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchFtEncoder()
        self.linear = tnn.Linear(EMBED, D_MODEL)
        self.ln = tnn.LayerNorm(D_MODEL)
        self.decoder = TorchTFDecoder()

    def _dec_in(self, x):
        return self.ln(self.linear(self.encoder(x)))

    def forward_train(self, x, targets, lens):
        return self.decoder.forward_train(self._dec_in(x), targets, lens)

    def forward_test(self, x):
        return self.decoder.forward_test(self._dec_in(x))

    def reference_style_state_dict(self):
        sd = self.encoder.reference_style_state_dict()
        sd["linear_norm.0.weight"] = self.linear.weight.detach().numpy()
        sd["linear_norm.0.bias"] = self.linear.bias.detach().numpy()
        sd["linear_norm.1.weight"] = self.ln.weight.detach().numpy()
        sd["linear_norm.1.bias"] = self.ln.bias.detach().numpy()
        sd.update(self.decoder.reference_style_state_dict(prefix="decoder."))
        return sd


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(3)
    trec = TorchRecognizer().eval()

    model = RecModel(
        encoder=VisionTransformer(
            img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
            num_heads=HEADS, qkv_bias=True, use_mean_pooling=False,
            return_feat_map=True,
        ),
        decoder=_flax_decoder(),
    )
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, *IMG, 3)).astype(np.float32)
    targets = rng.integers(0, NUM_CLASSES, size=(3, T_MAX)).astype(np.int64)
    lens = np.array([4, T_MAX, 6], np.int64)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), True)
    import copy
    params = copy.deepcopy(jax.device_get(variables["params"]))

    sd = trec.reference_style_state_dict()
    assert has_decoder_keys(sd)
    tree = convert_torch_recognizer(sd)
    # strict graft: every converted leaf must land on a same-shaped slot
    _graft(params, tree)
    return trec, model, params, x, targets, lens


def test_teacher_forced_logits_match_end_to_end(converted):
    trec, model, params, x, targets, lens = converted
    with torch.no_grad():
        ref = trec.forward_train(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(targets), torch.from_numpy(lens)).numpy()
    out = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(targets, jnp.int32),
                      jnp.asarray(lens, jnp.int32), True)
    assert np.abs(np.asarray(out) - ref).max() < 3e-4


def test_greedy_ids_match_end_to_end(converted):
    trec, model, params, x, targets, lens = converted
    with torch.no_grad():
        ref_probs, ref_ids = trec.forward_test(
            torch.from_numpy(x).permute(0, 3, 1, 2))
    probs, ids = model.apply({"params": params}, jnp.asarray(x),
                             method=model.recognize)
    assert np.array_equal(np.asarray(ids), ref_ids.numpy())
    assert np.abs(np.asarray(probs) - ref_probs.numpy()).max() < 2e-4


# ---------------------------------------------------------------------------
# Direct-import e2e: the reference's OWN RecModel
# (models/model_builder.py:74-202), built through its own
# create_encoder/create_decoder, real state_dict() -> convert -> eval paths.
# The hand-assembled TorchRecognizer above stays as the key-layout spec for
# published .pth checkpoints; these pin the same pipeline against the
# reference's executable model including its greedy AND beam eval forwards.
# ---------------------------------------------------------------------------

import os
import types

REF_DIR = "/root/reference"


@pytest.fixture(scope="module")
def ref_recmodel():
    pytest.importorskip("einops")
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    from tests.test_reference_grad_parity import (
        NB, T_MAX as GT_MAX, _register_test_encoder, _graft as graft_strict,
    )
    from models import model_builder

    from dig_tpu.models.decoder import create_decoder
    from dig_tpu.utils.checkpoint import convert_torch_recognizer

    _register_test_encoder()
    torch.manual_seed(29)
    args = types.SimpleNamespace(
        model="vit_gradpin_patch4_32x128", nb_classes=NB, max_len=GT_MAX,
        decoder_name="small_tf_decoder", drop=0.0, drop_path=0.0,
        attn_drop_rate=0.0, use_mean_pooling=False, init_scale=0.001,
        use_seq_cls_token=False, text_cond_vis=False, use_1d_attdec=False,
        beam_width=0)
    tref = model_builder.RecModel(args).eval()

    model = RecModel(
        encoder=VisionTransformer(
            img_size=IMG, patch_size=PATCH, embed_dim=48, depth=2,
            num_heads=2, qkv_bias=True, use_mean_pooling=False,
            return_feat_map=True),
        decoder=create_decoder("small_tf_decoder", NB, GT_MAX))
    rng = np.random.default_rng(30)
    x = rng.normal(size=(3, *IMG, 3)).astype(np.float32)
    targets = rng.integers(0, NB, size=(3, GT_MAX)).astype(np.int64)
    lens = np.array([GT_MAX, 4, 6], np.int64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), True)
    import copy
    params = copy.deepcopy(jax.device_get(variables["params"]))
    sd = {k: v.detach().numpy().copy()
          for k, v in tref.state_dict().items()}
    graft_strict(params, convert_torch_recognizer(sd))
    return tref, model, params, x


def test_ref_recmodel_greedy_e2e(ref_recmodel):
    tref, model, params, x = ref_recmodel
    with torch.no_grad():
        out = tref((torch.from_numpy(x).permute(0, 3, 1, 2), None, None))
    ref_probs = out[0].numpy()
    ref_ids = ref_probs.argmax(-1)
    probs, ids = model.apply({"params": params}, jnp.asarray(x),
                             method=model.recognize)
    assert np.array_equal(np.asarray(ids), ref_ids)
    assert np.abs(np.asarray(probs) - ref_probs).max() < 3e-4


@pytest.mark.parametrize("width", [1, 3])
def test_ref_recmodel_beam_e2e(ref_recmodel, width):
    """Beam through the reference's own eval forward (RecModel.forward ->
    decoder beam_search with its hardcoded eos=94 — out of this tiny
    vocab's range, so both beams run the full max_seq_len with no EOS
    truncation and every position is comparable)."""
    tref, model, params, x = ref_recmodel
    tref.beam_width = width
    try:
        with torch.no_grad():
            out = tref((torch.from_numpy(x).permute(0, 3, 1, 2), None, None))
        ref_ids = out[0].numpy()
    finally:
        tref.beam_width = 0
    _, ids = model.apply({"params": params}, jnp.asarray(x), width, 94,
                         method=model.recognize)
    assert np.array_equal(np.asarray(ids), ref_ids)
