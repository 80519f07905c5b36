"""--finetune checkpoint surgery parity (reference:
run_class_finetuning.py:362-441): `backbone.`-prefix remap and bicubic
pos-embed re-interpolation on input-resolution mismatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.utils.checkpoint import (
    convert_torch_encoder,
    interpolate_pos_embed,
    merge_pretrained_encoder,
)


def _torch_like_encoder_sd(prefix="", grid=(8, 32), dim=16, depth=1):
    """A synthetic reference-layout state dict (modeling_finetune.py keys)."""
    rng = np.random.default_rng(0)
    n = grid[0] * grid[1]
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, 4, 4)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(dim,)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, n, dim)).astype(np.float32),
        "norm.weight": np.ones((dim,), np.float32),
        "norm.bias": np.zeros((dim,), np.float32),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.attn.qkv.weight": rng.normal(size=(3 * dim, dim)).astype(np.float32),
            f"blocks.{i}.attn.q_bias": np.zeros((dim,), np.float32),
            f"blocks.{i}.attn.v_bias": np.zeros((dim,), np.float32),
            f"blocks.{i}.attn.proj.weight": rng.normal(size=(dim, dim)).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros((dim,), np.float32),
            f"blocks.{i}.norm1.weight": np.ones((dim,), np.float32),
            f"blocks.{i}.norm1.bias": np.zeros((dim,), np.float32),
            f"blocks.{i}.norm2.weight": np.ones((dim,), np.float32),
            f"blocks.{i}.norm2.bias": np.zeros((dim,), np.float32),
            f"blocks.{i}.mlp.fc1.weight": rng.normal(size=(2 * dim, dim)).astype(np.float32),
            f"blocks.{i}.mlp.fc1.bias": np.zeros((2 * dim,), np.float32),
            f"blocks.{i}.mlp.fc2.weight": rng.normal(size=(dim, 2 * dim)).astype(np.float32),
            f"blocks.{i}.mlp.fc2.bias": np.zeros((dim,), np.float32),
        })
    return {prefix + k: v for k, v in sd.items()}


def test_backbone_prefix_remap():
    """`backbone.*` keys are remapped like run_class_finetuning.py:388-391."""
    sd = _torch_like_encoder_sd(prefix="backbone.")
    tree = convert_torch_encoder(sd, prefix="encoder.")
    assert "patch_embed" in tree and "blocks_0" in tree
    np.testing.assert_array_equal(
        tree["blocks_0"]["attn"]["qkv_kernel"],
        sd["backbone.blocks.0.attn.qkv.weight"].T,
    )


def test_encoder_prefix_still_preferred():
    sd = _torch_like_encoder_sd(prefix="encoder.")
    tree = convert_torch_encoder(sd, prefix="encoder.")
    assert "blocks_0" in tree


def test_interpolate_pos_embed_identity():
    """Same-resolution interpolation is (near-)exact."""
    pos = np.random.default_rng(1).normal(size=(1, 8 * 32, 16)).astype(np.float32)
    out = interpolate_pos_embed(pos, (8, 32), old_grid=(8, 32))
    assert np.allclose(out, pos, atol=1e-5)


def test_interpolate_pos_embed_aspect_inferred():
    """The old grid is inferred preserving the target 1:4 aspect ratio
    (the reference's sqrt assumption breaks on DiG's 8x32 grid)."""
    pos = np.random.default_rng(2).normal(size=(1, 4 * 16, 16)).astype(np.float32)
    out = interpolate_pos_embed(pos, (8, 32))  # infers 4x16 source grid
    assert out.shape == (1, 8 * 32, 16)
    assert np.isfinite(out).all()


def test_merge_interpolates_mismatched_pos_embed():
    """A learnable pos_embed from a different input resolution lands
    interpolated, not skipped (reference :403-424)."""
    from dig_tpu.models.registry import create_model

    enc = create_model("vit_micro_patch4_32x128", return_feat_map=True,
                       use_learnable_pos_emb=True)
    images = jnp.zeros((1, 32, 128, 3), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), images, deterministic=True)
    params = {"encoder": jax.device_get(v["params"])}
    dim = params["encoder"]["pos_embed"].shape[-1]

    # source checkpoint trained at half resolution: 4x16 grid
    src_pos = np.random.default_rng(3).normal(size=(1, 4 * 16, dim)).astype(np.float32)
    src = {"pos_embed": src_pos}
    before = params["encoder"]["pos_embed"].copy()
    merged = merge_pretrained_encoder(params, src, pos_embed_grid=(8, 32))
    after = merged["encoder"]["pos_embed"]
    assert after.shape == before.shape
    assert not np.allclose(after, before)  # it actually landed
    expect = interpolate_pos_embed(src_pos, (8, 32))
    np.testing.assert_allclose(after, expect.astype(after.dtype), rtol=1e-5)


def test_merge_skips_truly_incompatible_leaves(capsys):
    params = {"encoder": {"pos_embed": np.zeros((1, 256, 16), np.float32)}}
    src = {"pos_embed": np.zeros((1, 64, 32), np.float32)}  # wrong width
    merged = merge_pretrained_encoder(params, src, pos_embed_grid=(8, 32))
    assert np.allclose(merged["encoder"]["pos_embed"], 0)
    assert "skip" in capsys.readouterr().out


def test_merge_keeps_dst_extra_tokens_when_src_has_none():
    """Grafting a plain-encoder pos_embed into a model whose pos_embed
    carries extra (e.g. seq-cls query) tokens: the destination's extra
    rows survive and only the grid rows are replaced.  The round-2 code
    sliced the source with the destination's extra count, corrupting the
    embedding."""
    n_extra, dim = 2, 16
    rng = np.random.default_rng(4)
    dst_pos = rng.normal(size=(1, n_extra + 8 * 32, dim)).astype(np.float32)
    params = {"encoder": {"pos_embed": dst_pos.copy()}}
    src_pos = rng.normal(size=(1, 4 * 16, dim)).astype(np.float32)  # no extras
    merged = merge_pretrained_encoder(
        params, {"pos_embed": src_pos}, pos_embed_grid=(8, 32))
    out = merged["encoder"]["pos_embed"]
    assert out.shape == dst_pos.shape
    np.testing.assert_array_equal(out[:, :n_extra], dst_pos[:, :n_extra])
    expect = interpolate_pos_embed(src_pos, (8, 32))
    np.testing.assert_allclose(out[:, n_extra:], expect.astype(out.dtype),
                               rtol=1e-5)


def test_merge_same_extra_token_count_passes_through():
    """Source and destination both carry the same extra-token rows: the
    extras are copied from the source and the grid interpolated."""
    n_extra, dim = 3, 16
    rng = np.random.default_rng(5)
    dst_pos = np.zeros((1, n_extra + 8 * 32, dim), np.float32)
    src_pos = rng.normal(size=(1, n_extra + 4 * 16, dim)).astype(np.float32)
    merged = merge_pretrained_encoder(
        {"encoder": {"pos_embed": dst_pos}}, {"pos_embed": src_pos},
        pos_embed_grid=(8, 32))
    out = merged["encoder"]["pos_embed"]
    np.testing.assert_array_equal(out[:, :n_extra], src_pos[:, :n_extra])
    expect = interpolate_pos_embed(src_pos, (8, 32), num_extra_tokens=n_extra)
    np.testing.assert_allclose(out, expect.astype(out.dtype), rtol=1e-5)


def test_load_finetune_init_routes_full_recognizer_pth(tmp_path):
    """--finetune with a finetuned reference .pth (decoder.* keys present)
    grafts decoder + linear_norm too, not just the encoder — a published
    DiG_finetuned checkpoint must not evaluate a random decoder
    (reference surgery: run_class_finetuning.py:362-441)."""
    import pytest
    torch = pytest.importorskip("torch")
    from dig_tpu.cli.run_finetune import build_model, load_finetune_init
    from dig_tpu.config import FinetuneConfig
    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.finetune import init_finetune_state

    cfg = FinetuneConfig(model="vit_micro_patch4_32x128", drop=0.0,
                         attn_drop_rate=0.0, drop_path=0.0)
    model = build_model(cfg)
    tx = make_optimizer(np.array([0.0], np.float32))
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0),
                                max_len=cfg.max_len)
    p0 = jax.device_get(state.params)
    rng = np.random.default_rng(6)
    dm = p0["decoder"]["trg_word_emb"]["embedding"].shape[-1]
    enc_dim = p0["linear_norm"]["dense"]["kernel"].shape[0]
    sd = {
        "decoder.trg_word_emb.weight":
            rng.normal(size=(cfg.nb_classes + 1, dm)).astype(np.float32),
        "decoder.classifier.weight":
            rng.normal(size=(cfg.nb_classes, dm)).astype(np.float32),
        "decoder.classifier.bias": rng.normal(size=(cfg.nb_classes,)).astype(np.float32),
        "linear_norm.0.weight": rng.normal(size=(dm, enc_dim)).astype(np.float32),
        "linear_norm.0.bias": rng.normal(size=(dm,)).astype(np.float32),
    }
    path = tmp_path / "full_rec.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(path))
    cfg.finetune = str(path)
    new_state = load_finetune_init(cfg, state, model)
    p1 = new_state.params
    np.testing.assert_allclose(
        p1["decoder"]["trg_word_emb"]["embedding"],
        sd["decoder.trg_word_emb.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        p1["decoder"]["classifier"]["kernel"],
        sd["decoder.classifier.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        p1["linear_norm"]["dense"]["kernel"],
        sd["linear_norm.0.weight"].T, rtol=1e-6)
    # untouched leaves stay
    np.testing.assert_array_equal(
        p1["decoder"]["layer_norm"]["scale"],
        p0["decoder"]["layer_norm"]["scale"])


def test_convert_torch_decoder_decoupled_and_textcond_keys():
    """The decoupled extras live per-layer in torch
    (layer_stack.i.mlp_order2cls_attn.{0,3} / new_linear_v,
    transformer_layer.py:157-165) but decoder-level here
    (order2cls_{i} / new_linear_v_{i}); text-conditional cross-attention
    adds gamma_decode/vis_proj/vis_norm/vis_cond_norm
    (transformer_layer.py:319-324)."""
    from dig_tpu.utils.checkpoint import convert_torch_decoder

    rng = np.random.default_rng(7)
    d, di, nc = 16, 8, 5
    sd = {
        "decoder.order_enc.weight": rng.normal(size=(9, d)).astype(np.float32),
        "decoder.layer_stack.0.mlp_order2cls_attn.0.weight":
            rng.normal(size=(di, d)).astype(np.float32),
        "decoder.layer_stack.0.mlp_order2cls_attn.0.bias":
            rng.normal(size=(di,)).astype(np.float32),
        "decoder.layer_stack.0.mlp_order2cls_attn.3.weight":
            rng.normal(size=(nc, di)).astype(np.float32),
        "decoder.layer_stack.0.mlp_order2cls_attn.3.bias":
            rng.normal(size=(nc,)).astype(np.float32),
        "decoder.layer_stack.0.new_linear_v.weight":
            rng.normal(size=(d, d)).astype(np.float32),
        "decoder.layer_stack.0.enc_attn.gamma_decode.weight":
            rng.normal(size=(2 * d, d)).astype(np.float32),
        "decoder.layer_stack.0.enc_attn.gamma_decode.bias":
            rng.normal(size=(2 * d,)).astype(np.float32),
        "decoder.layer_stack.0.enc_attn.vis_proj.weight":
            rng.normal(size=(d, d)).astype(np.float32),
        "decoder.layer_stack.0.enc_attn.vis_norm.weight":
            np.ones((d,), np.float32),
        "decoder.layer_stack.0.enc_attn.vis_norm.bias":
            np.zeros((d,), np.float32),
        "decoder.layer_stack.0.enc_attn.vis_cond_norm.weight":
            np.ones((d,), np.float32),
        "decoder.position_enc.position_table":
            np.zeros((1, 50, d), np.float32),  # buffer: must be skipped
    }
    tree = convert_torch_decoder(sd)
    np.testing.assert_array_equal(tree["order_enc"]["embedding"],
                                  sd["decoder.order_enc.weight"])
    np.testing.assert_array_equal(
        tree["order2cls_0"]["Dense_0"]["kernel"],
        sd["decoder.layer_stack.0.mlp_order2cls_attn.0.weight"].T)
    np.testing.assert_array_equal(
        tree["order2cls_0"]["Dense_1"]["bias"],
        sd["decoder.layer_stack.0.mlp_order2cls_attn.3.bias"])
    np.testing.assert_array_equal(
        tree["new_linear_v_0"]["kernel"],
        sd["decoder.layer_stack.0.new_linear_v.weight"].T)
    ea = tree["layers_0"]["enc_attn"]
    np.testing.assert_array_equal(
        ea["gamma_decode"]["kernel"],
        sd["decoder.layer_stack.0.enc_attn.gamma_decode.weight"].T)
    np.testing.assert_array_equal(
        ea["vis_norm"]["scale"],
        sd["decoder.layer_stack.0.enc_attn.vis_norm.weight"])
    assert "vis_cond_norm" in ea and "scale" in ea["vis_cond_norm"]
    assert "position_enc" not in tree and "position_table" not in tree


def test_has_decoder_keys_ignores_ssl_pixel_decoder():
    """An SSL pretrain checkpoint's SimMIM *pixel* decoder (saved under
    `decoder.*` by the reference MoCo_ViT) must NOT trigger the
    full-recognizer converter — it would hard-code prefix='encoder.' and
    drop --model_prefix support."""
    from dig_tpu.utils.checkpoint import has_decoder_keys

    ssl_sd = {"encoder.blocks.0.attn.qkv.weight": 0,
              "decoder.blocks.0.attn.qkv.weight": 0,
              "decoder.head.weight": 0}
    assert has_decoder_keys(ssl_sd) is False
    assert has_decoder_keys({"decoder.layer_stack.0.norm1.weight": 0}) is True
    assert has_decoder_keys({"decoder.trg_word_emb.weight": 0}) is True
    assert has_decoder_keys({"decoder.decoder.gru.weight_ih_l0": 0}) is True


def test_merge_fails_fast_on_wholly_mismatched_subtree():
    """A converted multi-tensor subtree that grafts zero leaves is an
    architecture mismatch (e.g. a TFDecoder .pth into a GRU-head model):
    raise instead of silently evaluating random weights."""
    from dig_tpu.utils.checkpoint import merge_pretrained_tree

    params = {"decoder": {"gru": {"ir": {"kernel": np.zeros((4, 4))}},
                          "fc": {"kernel": np.zeros((4, 2))}}}
    tf_tree = {"decoder": {"trg_word_emb": {"embedding": np.zeros((9, 8))},
                           "classifier": {"kernel": np.zeros((8, 9))}}}
    with pytest.raises(ValueError, match="architecture mismatch"):
        merge_pretrained_tree(params, tf_tree)
    # partial match still merges with skip notes (documented behavior)
    ok_tree = {"decoder": {"fc": {"kernel": np.ones((4, 2))},
                           "classifier": {"kernel": np.zeros((8, 9))}}}
    merged = merge_pretrained_tree(params, ok_tree)
    assert np.allclose(merged["decoder"]["fc"]["kernel"], 1)


def test_resume_pth_raises_clear_error(tmp_path):
    """--resume only restores native checkpoints; a .pth there is a
    confused --finetune and must fail fast with guidance (before any
    global GELU state is flipped)."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig
    from dig_tpu.ops import activations

    old = activations.EXACT
    with pytest.raises(ValueError, match="--finetune"):
        main(FinetuneConfig(model="vit_micro_patch4_32x128",
                            resume="model.pth",
                            output_dir=str(tmp_path / "o")))
    assert activations.EXACT is old
