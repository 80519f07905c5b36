"""Export dig_tpu Flax parameter trees to the reference's torch
``state_dict`` layout — the exact inverse of the importers in
`dig_tpu.utils.checkpoint` (`convert_torch_encoder`,
`convert_torch_decoder`, `convert_torch_attn_head`).

Why: checkpoint interop both ways.  The importer lets published DiG
weights run here; this exporter lets weights *trained here* load into
the reference ecosystem (`RecModel.load_state_dict`,
models/model_builder.py:74-202 + run_class_finetuning.py:362-441) for
cross-validation on GPU rigs.

Keys follow the reference module layout exactly: `encoder.*`
(modeling_finetune.py:213-366), `linear_norm.{0,1}.*`
(models/model_builder.py:85-88), `decoder.*` (models/decoder.py:107-436,
models/transformer_layer.py:47-383, models/attn_decoder.py:11-279).
Registered *buffers* the reference recomputes in ``__init__`` (the
sinusoid `position_enc.position_table`, the GRU head's one-hot
char embedding) are not emitted — load with ``strict=False`` or the
reference's own tolerant loader.

Round-trip guarantee (tested): ``convert_*(export_*(tree)) == tree``
bit-for-bit for every leaf with a reference counterpart.  The
`SeqClsRecModel.multi_label` head is NOT exported — it is a dig_tpu
design (class-query pooling module); the reference realizes the same
capability as extra cls tokens inside the encoder (`vit_seq_cls_*`,
modeling_finetune.py:368-451) with an incompatible layout.  The one
underdetermined inverse is the GRU bias split —
flax merges torch's per-gate input/hidden biases for r/z
(`b_ir + b_hr`); the exporter writes the merged value to ``bias_ih`` and
zeros to ``bias_hh``, which is the same function.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "export_torch_encoder",
    "export_torch_decoder",
    "export_torch_attn_head",
    "export_torch_recognizer",
]


def _np(v):
    return np.asarray(v)


def export_torch_encoder(tree: dict, prefix: str = "encoder.",
                         patch_size: int = 4) -> dict:
    """Flax ViT encoder tree -> torch key/value dict (inverse of
    `convert_torch_encoder`)."""
    out = {}

    def put(key, v):
        out[prefix + key] = _np(v)

    if "patch_embed" in tree:
        kernel = _np(tree["patch_embed"]["proj"]["kernel"])  # [p*p*C, D]
        rows, d = kernel.shape
        p = patch_size
        c = rows // (p * p)
        assert c * p * p == rows, (rows, p)
        put("patch_embed.proj.weight",
            kernel.reshape(p, p, c, d).transpose(3, 2, 0, 1))
        put("patch_embed.proj.bias", tree["patch_embed"]["proj"]["bias"])
    if "mask_token" in tree:
        put("mask_token", _np(tree["mask_token"]).reshape(1, 1, -1))
    if "pos_embed" in tree:
        put("pos_embed", tree["pos_embed"])
    for name, blk in tree.items():
        if not name.startswith("blocks_"):
            continue
        i = name[len("blocks_"):]
        b = f"blocks.{i}."
        attn = blk["attn"]
        put(b + "attn.qkv.weight", _np(attn["qkv_kernel"]).T)
        if "q_bias" in attn:
            put(b + "attn.q_bias", attn["q_bias"])
            put(b + "attn.v_bias", attn["v_bias"])
        put(b + "attn.proj.weight", _np(attn["proj"]["kernel"]).T)
        put(b + "attn.proj.bias", attn["proj"]["bias"])
        for norm in ("norm1", "norm2"):
            put(b + norm + ".weight", blk[norm]["scale"])
            put(b + norm + ".bias", blk[norm]["bias"])
        put(b + "mlp.fc1.weight", _np(blk["mlp"]["Dense_0"]["kernel"]).T)
        put(b + "mlp.fc1.bias", blk["mlp"]["Dense_0"]["bias"])
        put(b + "mlp.fc2.weight", _np(blk["mlp"]["Dense_1"]["kernel"]).T)
        put(b + "mlp.fc2.bias", blk["mlp"]["Dense_1"]["bias"])
        for g in ("gamma_1", "gamma_2"):
            if g in blk:
                put(b + g, blk[g])
    for norm in ("norm", "fc_norm"):
        if norm in tree:
            put(norm + ".weight", tree[norm]["scale"])
            put(norm + ".bias", tree[norm]["bias"])
    return out


def _export_mha(tree: dict, prefix: str) -> dict:
    """Inverse of `_convert_torch_mha` (reference
    models/transformer_layer.py:204-383)."""
    out = {}
    for mod in ("linear_q", "linear_k", "linear_v", "fc",
                "gamma_decode", "vis_proj"):
        if mod in tree:
            out[prefix + mod + ".weight"] = _np(tree[mod]["kernel"]).T
            if "bias" in tree[mod]:
                out[prefix + mod + ".bias"] = _np(tree[mod]["bias"])
    for mod in ("vis_norm", "vis_cond_norm"):
        if mod in tree:
            out[prefix + mod + ".weight"] = _np(tree[mod]["scale"])
            out[prefix + mod + ".bias"] = _np(tree[mod]["bias"])
    return out


def export_torch_decoder(tree: dict, prefix: str = "decoder.") -> dict:
    """Flax TFDecoder / DecoupledTFDecoder tree -> torch keys (inverse of
    `convert_torch_decoder`; reference models/decoder.py:107-436)."""
    out = {}

    def put(key, v):
        out[prefix + key] = _np(v)

    if "trg_word_emb" in tree:
        put("trg_word_emb.weight", tree["trg_word_emb"]["embedding"])
    if "order_enc" in tree:
        put("order_enc.weight", tree["order_enc"]["embedding"])
    if "layer_norm" in tree:
        put("layer_norm.weight", tree["layer_norm"]["scale"])
        put("layer_norm.bias", tree["layer_norm"]["bias"])
    if "classifier" in tree:
        put("classifier.weight", _np(tree["classifier"]["kernel"]).T)
        put("classifier.bias", tree["classifier"]["bias"])
    for name, blk in tree.items():
        if not name.startswith("layers_"):
            continue
        i = name[len("layers_"):]
        b = f"layer_stack.{i}."
        for attn in ("self_attn", "enc_attn"):
            if attn in blk:
                out.update({prefix + k: v for k, v in
                            _export_mha(blk[attn], b + attn + ".").items()})
        for norm in ("norm1", "norm2", "norm3"):
            if norm in blk:
                put(b + norm + ".weight", blk[norm]["scale"])
                put(b + norm + ".bias", blk[norm]["bias"])
        if "mlp" in blk:
            for w in ("w_1", "w_2"):
                put(b + "mlp." + w + ".weight", _np(blk["mlp"][w]["kernel"]).T)
                put(b + "mlp." + w + ".bias", blk["mlp"][w]["bias"])
    # decoupled extras live at the decoder level in the Flax tree but on
    # the layer in the reference (models/transformer_layer.py:157-165)
    for name, sub in tree.items():
        if name.startswith("order2cls_"):
            i = name[len("order2cls_"):]
            b = f"layer_stack.{i}.mlp_order2cls_attn."
            put(b + "0.weight", _np(sub["Dense_0"]["kernel"]).T)
            put(b + "0.bias", sub["Dense_0"]["bias"])
            put(b + "3.weight", _np(sub["Dense_1"]["kernel"]).T)
            put(b + "3.bias", sub["Dense_1"]["bias"])
        elif name.startswith("new_linear_v_"):
            i = name[len("new_linear_v_"):]
            put(f"layer_stack.{i}.new_linear_v.weight", _np(sub["kernel"]).T)
            if "bias" in sub:
                put(f"layer_stack.{i}.new_linear_v.bias", sub["bias"])
    return out


def export_torch_attn_head(tree: dict, prefix: str = "decoder.") -> dict:
    """Flax `AttentionRecognitionHead` tree -> torch GRU-head keys
    (inverse of `convert_torch_attn_head`; reference
    models/attn_decoder.py:203-279).  The flax-merged r/z biases go to
    ``bias_ih_l0`` with zeros in ``bias_hh_l0`` (same function — torch
    adds them for r/z; the n-gate biases stay separate on both sides)."""
    out = {}

    def put(key, v):
        out[prefix + key] = _np(v)

    lin = {"s_embed": "decoder.attention_unit.sEmbed",
           "x_embed": "decoder.attention_unit.xEmbed",
           "w_embed": "decoder.attention_unit.wEmbed",
           "fc": "decoder.fc"}
    for src, dst in lin.items():
        if src in tree:
            put(dst + ".weight", _np(tree[src]["kernel"]).T)
            put(dst + ".bias", tree[src]["bias"])
    if "tgt_embedding" in tree:
        put("decoder.tgt_embedding.weight", tree["tgt_embedding"]["embedding"])
    if "gru" in tree:
        gru = tree["gru"]
        h = _np(gru["hr"]["kernel"]).shape[0]
        w_ih = np.concatenate(
            [_np(gru["i" + g]["kernel"]).T for g in ("r", "z", "n")], axis=0)
        w_hh = np.concatenate(
            [_np(gru["h" + g]["kernel"]).T for g in ("r", "z", "n")], axis=0)
        b_ih = np.concatenate(
            [_np(gru["ir"]["bias"]), _np(gru["iz"]["bias"]),
             _np(gru["in"]["bias"])])
        b_hh = np.concatenate(
            [np.zeros(h, b_ih.dtype), np.zeros(h, b_ih.dtype),
             _np(gru["hn"]["bias"])])
        put("decoder.gru.weight_ih_l0", w_ih)
        put("decoder.gru.weight_hh_l0", w_hh)
        put("decoder.gru.bias_ih_l0", b_ih)
        put("decoder.gru.bias_hh_l0", b_hh)
    return out


def export_torch_recognizer(params: dict, patch_size: int = 4,
                            strict: bool = True) -> dict:
    """Full RecModel/AttnRecModel params -> the reference's finetuned
    checkpoint state_dict (inverse of `convert_torch_recognizer`).

    With ``strict`` (default), parameter trees that have NO reference
    layout (CTC's fc0/norm/fc1, SeqClsTokenRecModel's head, distillation
    projectors, ...) raise instead of silently exporting a headless
    encoder-only .pth; `multi_label` is the one documented exclusion
    (see module docstring)."""
    known = {"encoder", "linear_norm", "decoder", "multi_label"}
    extra = sorted(set(params) - known)
    if strict and extra:
        raise ValueError(
            f"param trees {extra} have no reference .pth layout — this "
            "head family cannot be exported as a reference recognizer "
            "(export the ViT alone with --encoder_only, or pass "
            "strict=False to drop these trees)")
    out = export_torch_encoder(params.get("encoder", {}),
                               patch_size=patch_size)
    if "linear_norm" in params:
        ln = params["linear_norm"]
        out["linear_norm.0.weight"] = _np(ln["dense"]["kernel"]).T
        out["linear_norm.0.bias"] = _np(ln["dense"]["bias"])
        out["linear_norm.1.weight"] = _np(ln["norm"]["scale"])
        out["linear_norm.1.bias"] = _np(ln["norm"]["bias"])
    if "decoder" in params:
        dec = params["decoder"]
        if "gru" in dec:
            out.update(export_torch_attn_head(dec))
        else:
            out.update(export_torch_decoder(dec))
    return out
