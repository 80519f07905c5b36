"""Numerical parity pinned against the reference's OWN torch modules,
imported directly from /root/reference (read-only) — superseding the
test-local torch ports in test_torch_parity.py / test_torch_decoder_parity.py
/ test_torch_gru_parity.py as the primary parity evidence.

Imports use a ~30-line `timm` shim (tests/_shims/timm: register_model +
drop_path/to_2tuple/trunc_normal_ — the only timm symbols the reference
touches) and a world-size-1 gloo process group so `concat_all_gather`
(modeling_pretrain_moco_mim_ori.py:580-591) works on CPU; the one `.cuda()`
call in `contrastive_loss` (:453) is monkeypatched to identity.

Covered, each on random weights routed through the real converters in
dig_tpu/utils/checkpoint.py:

* `models.decoder.TFDecoder` — teacher-forced logits, greedy probs/ids,
  beam ids (reference: models/decoder.py:107-370)
* text-conditional cross-attention decoder (`text_cond_vis=True`,
  models/transformer_layer.py:284-383)
* `models.decoder.DecoupledTFDecoder` — via its `_attention` directly:
  the reference's own `forward_train` crashes (it forwards a
  ``trg_word_emb`` kwarg the decoupled `_attention` does not accept,
  models/decoder.py:199 vs :415) — a latent bug this file documents
* `models.attn_decoder.AttentionRecognitionHead` — teacher-forced logits
  and greedy sample probs; the reference's GRU `beam_search` uses float
  tensor division as an index (models/attn_decoder.py:125) and raises
  under torch >= 1.5 semantics (also documented below); beam parity for
  the GRU head stays pinned by the numpy port in test_beam_parity.py
* `modeling_finetune.VisionTransformer` — feature-map forward
* `modeling_pretrain_vit.PretrainVisionTransformerEncoder` — masked forward
* `modeling_pretrain_moco_mim_ori.MoCo_ViT` — full SSL forward: q1/q2
  (student), k1/k2 (momentum), InfoNCE total, masked pixel predictions
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

for _p in (SHIM, REF):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax
import jax.numpy as jnp

from dig_tpu.losses.infonce import info_nce_loss
from dig_tpu.models.attn_decoder import AttentionRecognitionHead
from dig_tpu.models.decoder import DecoupledTFDecoder, TFDecoder
from dig_tpu.models.moco import DiGPretrainModel
from dig_tpu.models.vit import PretrainViTEncoder, VisionTransformer
from dig_tpu.ops import activations
from dig_tpu.utils.checkpoint import (
    convert_torch_attn_head,
    convert_torch_decoder,
    convert_torch_encoder,
    convert_torch_moco,
)


@pytest.fixture(autouse=True)
def exact_gelu():
    old = activations.EXACT
    activations.EXACT = True
    yield
    activations.EXACT = old


def _graft(dst, src, path=""):
    """Overwrite flax params with converted torch tensors; every converted
    key must exist with the same shape (catches converter drift)."""
    for k, v in src.items():
        assert k in dst, f"converted key {path}/{k} missing from flax tree"
        if isinstance(v, dict):
            _graft(dst[k], v, f"{path}/{k}")
        else:
            assert np.shape(dst[k]) == np.shape(v), (path, k, np.shape(dst[k]),
                                                     np.shape(v))
            dst[k] = np.asarray(v, np.float32)


def _params_of(variables):
    import copy

    return copy.deepcopy(jax.device_get(variables["params"]))


def _sd(module, prefix=""):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# TFDecoder (direct import)
# ---------------------------------------------------------------------------

C, T, EOS, D, HEADS, DK, INNER, LAYERS, NPOS = 13, 7, 10, 48, 2, 24, 64, 2, 50


@pytest.fixture(scope="module")
def ref_tfdecoder():
    from models.decoder import TFDecoder as RefTFDecoder

    torch.manual_seed(3)
    ref = RefTFDecoder(n_layers=LAYERS, d_embedding=D, n_head=HEADS, d_k=DK,
                       d_v=DK, d_model=D, d_inner=INNER, n_position=NPOS,
                       dropout=0.1, num_classes=C, max_seq_len=T).eval()
    model = TFDecoder(num_classes=C, n_layers=LAYERS, d_embedding=D,
                      n_head=HEADS, d_k=DK, d_v=DK, d_model=D, d_inner=INNER,
                      n_position=NPOS, dropout=0.0, max_seq_len=T)
    rng = np.random.default_rng(4)
    enc = rng.normal(size=(3, 12, D)).astype(np.float32) * 0.5
    targets = rng.integers(0, C, size=(3, T)).astype(np.int64)
    lens = np.array([3, T, 5], np.int64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), True)
    params = _params_of(variables)
    _graft(params, convert_torch_decoder(_sd(ref, "decoder.")))
    return ref, model, params, enc, targets, lens


def test_ref_tfdecoder_teacher_forced(ref_tfdecoder):
    ref, model, params, enc, targets, lens = ref_tfdecoder
    with torch.no_grad():
        out, _ = ref(None, torch.from_numpy(enc), torch.from_numpy(targets),
                     torch.from_numpy(lens), train_mode=True)
    mine = model.apply({"params": params}, jnp.asarray(enc),
                       jnp.asarray(targets, jnp.int32),
                       jnp.asarray(lens, jnp.int32), True)
    assert np.abs(np.asarray(mine) - out.numpy()).max() < 2e-4


def test_ref_tfdecoder_greedy(ref_tfdecoder):
    ref, model, params, enc, *_ = ref_tfdecoder
    with torch.no_grad():
        probs, _ = ref(None, torch.from_numpy(enc), train_mode=False)
    ref_probs = probs.numpy()
    ref_ids = ref_probs.argmax(-1)
    for method in ("greedy_decode", "greedy_decode_dense"):
        p, ids = model.apply({"params": params}, jnp.asarray(enc),
                             method=getattr(model, method))
        assert np.array_equal(np.asarray(ids), ref_ids), method
        assert np.abs(np.asarray(p) - ref_probs).max() < 1e-4, method


@pytest.mark.parametrize("width", [1, 3])
def test_ref_tfdecoder_beam(ref_tfdecoder, width):
    ref, model, params, enc, *_ = ref_tfdecoder
    with torch.no_grad():
        # call beam_search directly to pass eos (the forward() entry
        # hardcodes the 97-class charset's eos=94, models/decoder.py:254)
        p, _ = ref.beam_search(None, torch.from_numpy(enc), None, None, None,
                               width, eos=EOS)
    ref_ids = p.numpy()
    ids = np.asarray(model.apply({"params": params}, jnp.asarray(enc), width,
                                 EOS, method=model.beam_search))
    # positions after the completed hypothesis' first EOS are not
    # comparable (backtracking artifacts)
    for r in range(ref_ids.shape[0]):
        hits = np.where(ref_ids[r] == EOS)[0]
        n = hits[0] + 1 if len(hits) else ref_ids.shape[1]
        assert np.array_equal(ids[r, :n], ref_ids[r, :n]), r


# ---------------------------------------------------------------------------
# Text-conditional cross-attention decoder (direct import)
# ---------------------------------------------------------------------------


def test_ref_text_cond_decoder():
    from models.decoder import TFDecoder as RefTFDecoder

    torch.manual_seed(5)
    ref = RefTFDecoder(n_layers=2, d_embedding=32, n_head=2, d_k=16, d_v=16,
                       d_model=32, d_inner=48, n_position=NPOS, dropout=0.1,
                       num_classes=C, max_seq_len=5,
                       text_cond_vis=True).eval()
    model = TFDecoder(num_classes=C, n_layers=2, d_embedding=32, n_head=2,
                      d_k=16, d_v=16, d_model=32, d_inner=48, n_position=NPOS,
                      dropout=0.0, max_seq_len=5, text_cond_vis=True)
    rng = np.random.default_rng(6)
    enc = rng.normal(size=(2, 9, 32)).astype(np.float32) * 0.5
    targets = rng.integers(0, C, size=(2, 5)).astype(np.int64)
    lens = np.array([5, 3], np.int64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), True)
    params = _params_of(variables)
    _graft(params, convert_torch_decoder(_sd(ref, "decoder.")))
    with torch.no_grad():
        out, _ = ref(None, torch.from_numpy(enc), torch.from_numpy(targets),
                     torch.from_numpy(lens), train_mode=True)
    mine = model.apply({"params": params}, jnp.asarray(enc),
                       jnp.asarray(targets, jnp.int32),
                       jnp.asarray(lens, jnp.int32), True)
    assert np.abs(np.asarray(mine) - out.numpy()).max() < 2e-4


# ---------------------------------------------------------------------------
# DecoupledTFDecoder (direct import, via _attention)
# ---------------------------------------------------------------------------

NC97 = 97  # the decoupled layer hardcodes 97 classes (transformer_layer.py:160)


def test_ref_decoupled_forward_train_is_broken():
    """Documents the reference bug that forces the _attention-level pin
    below: TFDecoder.forward_train forwards trg_word_emb= to _attention
    (models/decoder.py:199), which DecoupledTFDecoder._attention does not
    accept (:415) -> TypeError."""
    from models.decoder import DecoupledTFDecoder as RefDecoupled

    torch.manual_seed(7)
    ref = RefDecoupled(n_layers=1, d_embedding=32, n_head=2, d_k=16, d_v=16,
                       d_model=32, d_inner=48, num_classes=NC97,
                       max_seq_len=4).eval()
    enc = torch.randn(2, 9, 32)
    targets = torch.zeros(2, 4, dtype=torch.long)
    lens = torch.full((2,), 4, dtype=torch.long)
    maps = torch.softmax(torch.randn(2, NC97, 9), dim=-1)
    with pytest.raises(TypeError, match="trg_word_emb"):
        ref(None, enc, targets, lens, train_mode=True,
            cls_query_attn_maps=maps)


def test_ref_decoupled_attention_parity():
    from models.decoder import DecoupledTFDecoder as RefDecoupled

    torch.manual_seed(8)
    t_max = 4
    ref = RefDecoupled(n_layers=2, d_embedding=32, n_head=2, d_k=16, d_v=16,
                       d_model=32, d_inner=48, n_position=NPOS, dropout=0.1,
                       num_classes=NC97, max_seq_len=t_max).eval()
    model = DecoupledTFDecoder(num_classes=NC97, n_layers=2, d_embedding=32,
                               n_head=2, d_k=16, d_v=16, d_model=32,
                               d_inner=48, n_position=NPOS, dropout=0.0,
                               max_seq_len=t_max)
    rng = np.random.default_rng(9)
    enc = rng.normal(size=(2, 9, 32)).astype(np.float32) * 0.5
    targets = rng.integers(0, NC97, size=(2, t_max)).astype(np.int64)
    lens = np.array([t_max, 2], np.int64)
    maps = np.asarray(jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, NC97, 9))), np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(enc),
                           jnp.asarray(targets, jnp.int32),
                           jnp.asarray(lens, jnp.int32), jnp.asarray(maps),
                           True, method=model.decoupled_forward)
    params = _params_of(variables)
    _graft(params, convert_torch_decoder(_sd(ref, "decoder.")))

    # reference teacher-forced logits via its own _attention (the code
    # forward_train would run if not for the kwarg bug): BOS + shift-right
    with torch.no_grad():
        bos = torch.full((2, 1), NC97, dtype=torch.long)
        query = torch.cat([bos, torch.from_numpy(targets)], dim=-1)[:, :-1]
        out, _ = ref._attention(query, torch.from_numpy(lens),
                                torch.from_numpy(enc), None,
                                torch.from_numpy(maps))
        ref_logits = ref.classifier(out).numpy()
    mine = model.apply({"params": params}, jnp.asarray(enc),
                       jnp.asarray(targets, jnp.int32),
                       jnp.asarray(lens, jnp.int32), jnp.asarray(maps), True,
                       method=model.decoupled_forward)
    assert np.abs(np.asarray(mine) - ref_logits).max() < 3e-4


# ---------------------------------------------------------------------------
# AttentionRecognitionHead (direct import)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_gru_head():
    from models.attn_decoder import AttentionRecognitionHead as RefHead

    torch.manual_seed(11)
    num_classes, in_planes, s_dim, att_dim, t_max = 11, 32, 24, 20, 6
    ref = RefHead(num_classes=num_classes, in_planes=in_planes, sDim=s_dim,
                  attDim=att_dim, max_len_labels=t_max)
    model = AttentionRecognitionHead(num_classes=num_classes, s_dim=s_dim,
                                     att_dim=att_dim, max_len_labels=t_max)
    rng = np.random.default_rng(12)
    x = rng.normal(size=(3, 10, in_planes)).astype(np.float32)
    targets = rng.integers(0, num_classes, size=(3, t_max)).astype(np.int64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(targets, jnp.int32))
    params = _params_of(variables)
    _graft(params, convert_torch_attn_head(_sd(ref), prefix=""))
    return ref, model, params, x, targets, t_max


def test_ref_gru_teacher_forced(ref_gru_head):
    ref, model, params, x, targets, t_max = ref_gru_head
    lengths = [t_max] * 3
    ref.train()
    with torch.no_grad():
        out, _ = ref((torch.from_numpy(x), torch.from_numpy(targets), lengths))
    mine = model.apply({"params": params}, jnp.asarray(x),
                       jnp.asarray(targets, jnp.int32))
    assert np.abs(np.asarray(mine) - out.numpy()).max() < 2e-4


def test_ref_gru_greedy_sample(ref_gru_head):
    ref, model, params, x, *_ = ref_gru_head
    ref.eval()
    with torch.no_grad():
        probs, _ = ref((torch.from_numpy(x), None, None))
    ref_probs = probs.numpy()
    p, ids = model.apply({"params": params}, jnp.asarray(x),
                         method=model.sample)
    assert np.array_equal(np.asarray(ids), ref_probs.argmax(-1))
    assert np.abs(np.asarray(p) - ref_probs).max() < 1e-4


def test_ref_gru_beam_is_broken_on_modern_torch(ref_gru_head):
    """Documents why GRU beam parity is pinned by the numpy TopKDecoder
    port (test_beam_parity.py) instead of a direct call: the reference
    computes predecessors with float tensor division
    (models/attn_decoder.py:125, `candidates / self.num_classes`) and
    feeds it to index_select, which torch >= 1.5 rejects."""
    ref, *_ = ref_gru_head
    x = torch.randn(2, 10, 32)
    ref.eval()
    with pytest.raises((RuntimeError, TypeError)):
        ref.beam_search(x, beam_width=2, eos=9)


# ---------------------------------------------------------------------------
# VisionTransformer / PretrainVisionTransformerEncoder (direct import)
# ---------------------------------------------------------------------------


def test_ref_vision_transformer_feat_map():
    import modeling_finetune

    torch.manual_seed(13)
    dim, depth, heads = 48, 2, 2
    # num_classes=0 crashes the reference's own __init__ (trunc_normal_ on
    # the Identity head, modeling_finetune.py:305); a real head is unused
    # on the return_feat_map path (forward returns before it, :361-363)
    ref = modeling_finetune.VisionTransformer(
        img_size=(32, 128), patch_size=4, embed_dim=dim, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, num_classes=10,
        use_mean_pooling=False, return_feat_map=True).eval()
    model = VisionTransformer(img_size=(32, 128), patch_size=4,
                              embed_dim=dim, depth=depth, num_heads=heads,
                              qkv_bias=True, use_mean_pooling=False,
                              return_feat_map=True, drop_rate=0.0)
    rng = np.random.default_rng(14)
    img = rng.normal(size=(2, 3, 32, 128)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(img.transpose(0, 2, 3, 1)))
    params = _params_of(variables)
    _graft(params, convert_torch_encoder(_sd(ref, "encoder.")))
    with torch.no_grad():
        out = ref(torch.from_numpy(img)).numpy()
    mine = model.apply({"params": params},
                       jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert mine.shape == out.shape
    assert np.abs(np.asarray(mine) - out).max() < 3e-4


def test_ref_pretrain_encoder_masked():
    import modeling_pretrain_vit

    torch.manual_seed(15)
    dim, depth, heads = 48, 2, 2
    ref = modeling_pretrain_vit.PretrainVisionTransformerEncoder(
        img_size=(32, 128), patch_size=4, embed_dim=dim, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, num_classes=0).eval()
    # give the mask token a nonzero value so the substitution is visible
    with torch.no_grad():
        ref.mask_token.normal_(std=0.5)
    model = PretrainViTEncoder(img_size=(32, 128), patch_size=4,
                               embed_dim=dim, depth=depth, num_heads=heads,
                               qkv_bias=True, use_final_norm=True)
    rng = np.random.default_rng(16)
    img = rng.normal(size=(2, 3, 32, 128)).astype(np.float32)
    n = 8 * 32
    mask = np.zeros((2, n), bool)
    for r in range(2):
        mask[r, rng.permutation(n)[: n // 2]] = True
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(img.transpose(0, 2, 3, 1)),
                           jnp.asarray(mask))
    params = _params_of(variables)
    _graft(params, convert_torch_encoder(_sd(ref, "encoder.")))
    with torch.no_grad():
        out = ref(torch.from_numpy(img), torch.from_numpy(mask)).numpy()
    mine = model.apply({"params": params},
                       jnp.asarray(img.transpose(0, 2, 3, 1)),
                       jnp.asarray(mask))
    assert np.abs(np.asarray(mine) - out).max() < 3e-4


# ---------------------------------------------------------------------------
# MoCo_ViT (direct import): the full SSL forward
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gloo_world1(tmp_path_factory):
    """World-size-1 gloo group so concat_all_gather/get_rank work on CPU."""
    import torch.distributed as dist

    created = False
    if not dist.is_initialized():
        store = dist.FileStore(
            str(tmp_path_factory.mktemp("dist") / "store"), 1)
        dist.init_process_group("gloo", store=store, rank=0, world_size=1)
        created = True
    yield
    if created:
        dist.destroy_process_group()


@pytest.fixture(scope="module")
def moco_pair(gloo_world1):
    import modeling_pretrain_moco_mim_ori as ref_mod

    # the reference pins InfoNCE labels to CUDA (:453); identity on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(17)
        dim, depth, heads = 64, 2, 2
        ref = ref_mod.MoCo_ViT(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_ratio=4.0,
            qkv_bias=True, mlp_dim=96, dim=16, T=0.2, num_windows=4,
            use_pixel_target=True, use_moco_target=True,
            patchnet_name="regular")
        ref.train()  # BN uses batch statistics = SyncBN at world size 1
        model = DiGPretrainModel(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_dim=96,
            dim=16, temperature=0.2, num_windows=4, use_pixel_target=True,
            use_moco_target=True, qkv_bias=True)
        yield ref, model
    finally:
        torch.Tensor.cuda = orig_cuda


def test_ref_moco_vit_full_forward(moco_pair):
    """Pins q1/q2/k1/k2-equivalents, the 2T-scaled InfoNCE total and the
    masked pixel predictions against MoCo_ViT.forward
    (modeling_pretrain_moco_mim_ori.py:488-577) on converted weights."""
    ref, model = moco_pair
    rng = np.random.default_rng(18)
    b, n = 2, 8 * 32
    img = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
    aug = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
    mask = np.zeros((b, 2, n), bool)
    for r in range(b):
        for v in range(2):
            mask[r, v, rng.permutation(n)[:100]] = True

    all_images = np.concatenate([img, aug], 0).transpose(0, 2, 3, 1)
    mask_flat = mask.transpose(1, 0, 2).reshape(-1, n)  # ≙ forward :497

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(all_images),
                           jnp.asarray(mask_flat), True,
                           method=model.forward_student)
    params = _params_of(variables)
    tree = convert_torch_moco(_sd(ref))
    _graft(params, tree["student"])

    # torch init copies student -> momentum modules; the converted EMA
    # tree must therefore equal the student tree where it overlaps
    flat_s = jax.tree_util.tree_leaves(
        {k: tree["student"][k] for k in tree["ema"]})
    flat_m = jax.tree_util.tree_leaves(tree["ema"])
    assert len(flat_s) == len(flat_m) and all(
        np.array_equal(a, b) for a, b in zip(flat_s, flat_m))

    with torch.no_grad():
        out = ref(torch.from_numpy(img), torch.from_numpy(aug),
                  torch.from_numpy(mask), m=0.5)

    student = model.apply({"params": params}, jnp.asarray(all_images),
                          jnp.asarray(mask_flat), True,
                          method=model.forward_student)
    k1, k2 = model.apply({"params": params}, jnp.asarray(all_images),
                         jnp.asarray(mask_flat), True,
                         method=model.forward_key)

    # per-view student/momentum features: recompute the torch side's
    # intermediates by re-running its own submodules is unnecessary — the
    # loss decomposition below pins them jointly; the pixel branch pins
    # the encoder trunk directly.
    loss1 = info_nce_loss(student["q1"], jax.lax.stop_gradient(k2), 0.2)
    loss2 = info_nce_loss(student["q2"], jax.lax.stop_gradient(k1), 0.2)
    mine_contra = float(loss1 + loss2)
    assert abs(mine_contra - float(out["contra_loss"])) < 2e-3, (
        mine_contra, float(out["contra_loss"]))

    # masked pixel predictions on the ori view (only_mim_on_ori_img=True)
    ref_vis = out["vis_out"][0].numpy()  # [B, n_mask, 48]
    pix = np.asarray(student["pix_pred"])[:b]  # ori half
    mine_vis = np.stack([pix[r][mask[r, 0]] for r in range(b)])
    assert np.abs(mine_vis - ref_vis).max() < 1e-3


@pytest.mark.parametrize("patchnet", ["conv", "no_patchtrans"])
def test_ref_moco_vit_variant_forward(gloo_world1, patchnet):
    """Same full-forward pin for the PatchNet variants
    (modeling_pretrain_moco_mim_ori.py:207-258 ConvPatchNet, :372-378
    no_patchtrans pooling) — exercises `_convert_conv_patchnet` and the
    parameter-free extractor path of `convert_torch_moco`."""
    import modeling_pretrain_moco_mim_ori as ref_mod

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(21)
        dim, depth, heads = 64, 2, 2
        ref = ref_mod.MoCo_ViT(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_ratio=4.0,
            qkv_bias=True, mlp_dim=96, dim=16, T=0.2, num_windows=4,
            use_pixel_target=True, use_moco_target=True,
            patchnet_name=patchnet)
        ref.train()
        model = DiGPretrainModel(
            img_size=(32, 128), patch_size=4, encoder_embed_dim=dim,
            encoder_depth=depth, encoder_num_heads=heads,
            decoder_num_classes=48, decoder_embed_dim=32, mlp_dim=96,
            dim=16, temperature=0.2, num_windows=4, use_pixel_target=True,
            use_moco_target=True, qkv_bias=True, patchnet_name=patchnet)

        rng = np.random.default_rng(22)
        # b >= 5: the conv extractor yields ONE window per image, and the
        # reference's contrastive_loss computes top-5 accuracy over the
        # [B*W, B*W] logits (:459, :604) — fewer than 5 columns raises
        b, n = 6, 8 * 32
        img = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
        aug = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
        mask = np.zeros((b, 2, n), bool)
        for r in range(b):
            for v in range(2):
                mask[r, v, rng.permutation(n)[:100]] = True
        all_images = np.concatenate([img, aug], 0).transpose(0, 2, 3, 1)
        mask_flat = mask.transpose(1, 0, 2).reshape(-1, n)

        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(all_images),
                               jnp.asarray(mask_flat), True,
                               method=model.forward_student)
        params = _params_of(variables)
        tree = convert_torch_moco(_sd(ref))
        if patchnet == "no_patchtrans":
            assert "patch_extractor" not in tree["student"]
        else:
            assert "p2g_dense0" in tree["student"]["patch_extractor"]
        _graft(params, tree["student"])

        with torch.no_grad():
            out = ref(torch.from_numpy(img), torch.from_numpy(aug),
                      torch.from_numpy(mask), m=0.5)
        student = model.apply({"params": params}, jnp.asarray(all_images),
                              jnp.asarray(mask_flat), True,
                              method=model.forward_student)
        k1, k2 = model.apply({"params": params}, jnp.asarray(all_images),
                             jnp.asarray(mask_flat), True,
                             method=model.forward_key)
        loss1 = info_nce_loss(student["q1"], jax.lax.stop_gradient(k2), 0.2)
        loss2 = info_nce_loss(student["q2"], jax.lax.stop_gradient(k1), 0.2)
        mine_contra = float(loss1 + loss2)
        assert abs(mine_contra - float(out["contra_loss"])) < 2e-3, (
            patchnet, mine_contra, float(out["contra_loss"]))

        ref_vis = out["vis_out"][0].numpy()
        pix = np.asarray(student["pix_pred"])[:b]
        mine_vis = np.stack([pix[r][mask[r, 0]] for r in range(b)])
        assert np.abs(mine_vis - ref_vis).max() < 1e-3
    finally:
        torch.Tensor.cuda = orig_cuda


def test_ref_moco_vit_features(moco_pair):
    """Feature-level pin: q1/q2 and k1/k2 against the reference's own
    submodule pipeline (encoder -> pix_projector -> patch_extractor ->
    projector [-> predictor]), reproducing forward :500-549 step by
    step so each stage's conversion is exercised."""
    ref, model = moco_pair
    rng = np.random.default_rng(19)
    b, n = 2, 8 * 32
    img = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
    aug = rng.normal(size=(b, 3, 32, 128)).astype(np.float32)
    mask = np.zeros((b, 2, n), bool)
    for r in range(b):
        for v in range(2):
            mask[r, v, rng.permutation(n)[:100]] = True
    all_images = np.concatenate([img, aug], 0).transpose(0, 2, 3, 1)
    mask_flat = mask.transpose(1, 0, 2).reshape(-1, n)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(all_images),
                           jnp.asarray(mask_flat), True,
                           method=model.forward_student)
    params = _params_of(variables)
    _graft(params, convert_torch_moco(_sd(ref))["student"])

    with torch.no_grad():
        t_imgs = torch.from_numpy(np.concatenate([img, aug], 0))
        t_mask = torch.from_numpy(mask_flat)
        enc = ref.encoder(t_imgs, t_mask)
        m_half, a_half = enc.chunk(2, dim=0)
        bb, ll, cc = m_half.shape
        m_half = ref.pix_projector(m_half.reshape(bb * ll, cc)).reshape(bb, ll, cc)
        feats = torch.cat([m_half, a_half], dim=0)
        patches = ref.patch_extractor(feats)
        b2, w, c = patches.shape
        qs = ref.predictor(ref.encoder_projection_layer(
            patches.reshape(b2 * w, c))).reshape(b2, w, -1)
        q1, q2 = qs.chunk(2, dim=0)
        ks = ref.momentum_projection_layer(
            ref.momentum_patch_extractor(
                feats).reshape(b2 * w, c)).reshape(b2, w, -1)
        # momentum modules share the student's converted weights (copied
        # at torch init), so running them on `feats` reproduces the key
        # path of forward :531-549 exactly
        k1, k2 = ks.chunk(2, dim=0)

    student = model.apply({"params": params}, jnp.asarray(all_images),
                          jnp.asarray(mask_flat), True,
                          method=model.forward_student)
    mk1, mk2 = model.apply({"params": params}, jnp.asarray(all_images),
                           jnp.asarray(mask_flat), True,
                           method=model.forward_key)
    assert np.abs(np.asarray(student["q1"]) -
                  q1.reshape(-1, q1.shape[-1]).numpy()).max() < 2e-3
    assert np.abs(np.asarray(student["q2"]) -
                  q2.reshape(-1, q2.shape[-1]).numpy()).max() < 2e-3
    assert np.abs(np.asarray(mk1) -
                  k1.reshape(-1, k1.shape[-1]).numpy()).max() < 2e-3
    assert np.abs(np.asarray(mk2) -
                  k2.reshape(-1, k2.shape[-1]).numpy()).max() < 2e-3
