"""Reverse checkpoint interop: Flax trees -> reference torch state_dicts
(`dig_tpu.utils.export_torch`), pinned as the exact inverse of the
importers.  Combined with the converted-recognizer e2e parity tests
(tests/test_torch_recognizer_e2e.py), a bit-exact round trip proves
exported weights reproduce dig_tpu behavior inside the reference
(models/model_builder.py:74-202)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dig_tpu.models.rec_model import build_rec_model
from dig_tpu.utils.checkpoint import (
    convert_torch_attn_head,
    convert_torch_recognizer,
    has_decoder_keys,
)
from dig_tpu.utils.export_torch import (
    export_torch_attn_head,
    export_torch_recognizer,
)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: np.asarray(tree)}


def _init_params(model_kind="rec", decoder_name="small_tf_decoder"):
    model = build_rec_model(
        model_name="vit_micro_patch4_32x128", decoder_name=decoder_name,
        nb_classes=97, max_len=25, model_kind=model_kind,
    )
    images = jnp.zeros((2, 32, 128, 3), jnp.float32)
    if model_kind == "ctc":
        variables = model.init(jax.random.PRNGKey(0), images, True)
    else:
        targets = jnp.zeros((2, 25), jnp.int32)
        lens = jnp.ones((2,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), images, targets, lens, True)
    return jax.device_get(variables["params"])


def _assert_tree_roundtrip(params, tree):
    flat_src = _flatten(params)
    # the multi_label head is dig_tpu-native (no reference layout exists;
    # see export_torch docstring) — excluded from export by design
    flat_src = {k: v for k, v in flat_src.items() if k[0] != "multi_label"}
    flat_rt = _flatten(tree)
    missing = set(flat_src) - set(flat_rt)
    extra = set(flat_rt) - set(flat_src)
    assert not missing, f"leaves lost in export->convert: {sorted(missing)[:8]}"
    assert not extra, f"leaves invented: {sorted(extra)[:8]}"
    for path, v in flat_src.items():
        r = flat_rt[path]
        assert r.shape == v.shape, (path, r.shape, v.shape)
        np.testing.assert_array_equal(r, np.asarray(v), err_msg=str(path))


@pytest.mark.parametrize("decoder_name", ["small_tf_decoder",
                                          "decoupled_tf_decoder"])
def test_recognizer_tree_roundtrip(decoder_name):
    """convert(export(params)) is bit-exact and loses no leaves — for the
    vanilla TFDecoder and the decoupled variant (order_enc / order2cls /
    new_linear_v extras)."""
    params = _init_params(decoder_name=decoder_name)
    sd = export_torch_recognizer(params)
    assert has_decoder_keys(sd)
    for v in sd.values():  # a torch state_dict is flat name->tensor
        assert isinstance(v, np.ndarray)
    _assert_tree_roundtrip(params, convert_torch_recognizer(sd))


def test_gru_head_tree_roundtrip():
    """GRU-head export: the flax-merged r/z biases split to
    bias_ih/bias_hh and convert back to the identical tree
    (convert_torch_attn_head's merge, reference models/attn_decoder.py)."""
    params = _init_params(model_kind="attn")
    sd = export_torch_recognizer(params)
    assert "decoder.decoder.gru.weight_ih_l0" in sd
    assert has_decoder_keys(sd)
    tree = convert_torch_recognizer(sd)
    _assert_tree_roundtrip(params, tree)
    # bias identity actually used by torch: per-gate b_ih + b_hh
    dec = export_torch_attn_head(params["decoder"], prefix="")
    # keys carry the head-internal `decoder.` (DecoderUnit); the model-level
    # prefix goes on top -> `decoder.decoder.gru.*` like the reference
    rt = convert_torch_attn_head({"decoder." + k: v for k, v in dec.items()},
                                 prefix="decoder.")
    h = params["decoder"]["gru"]["hn"]["bias"].shape[0]
    b_ih, b_hh = dec["decoder.gru.bias_ih_l0"], dec["decoder.gru.bias_hh_l0"]
    np.testing.assert_array_equal(
        b_ih[:h] + b_hh[:h], np.asarray(params["decoder"]["gru"]["ir"]["bias"]))
    np.testing.assert_array_equal(
        b_ih[h:2 * h] + b_hh[h:2 * h],
        np.asarray(params["decoder"]["gru"]["iz"]["bias"]))
    assert rt  # sanity: the helper path parsed


@pytest.mark.slow
def test_export_pth_tool_full_circle(tmp_path, monkeypatch):
    """tools/export_pth.py: native checkpoint -> .pth -> back through the
    product --finetune conversion path, bit-exact."""
    pytest.importorskip("torch")
    import optax

    from dig_tpu.train.state import TrainState
    from dig_tpu.utils.checkpoint import load_torch_checkpoint, save_checkpoint
    from tools.export_pth import main as export_main

    params = _init_params()
    state = TrainState.create(params, optax.sgd(0.0))
    save_checkpoint(str(tmp_path), "x", state, extra={})

    pth = str(tmp_path / "export.pth")
    monkeypatch.setattr("sys.argv",
                        ["export_pth", str(tmp_path / "checkpoint-x"), pth])
    export_main()

    sd = load_torch_checkpoint(pth)
    assert has_decoder_keys(sd)
    _assert_tree_roundtrip(params, convert_torch_recognizer(sd))


def test_export_rejects_headless_families():
    """CTC / seq-cls-token heads have no reference .pth layout; strict
    export raises instead of silently writing an encoder-only file."""
    params = _init_params(model_kind="ctc")
    with pytest.raises(ValueError, match="no reference .pth layout"):
        export_torch_recognizer(params)
    sd = export_torch_recognizer(params, strict=False)  # encoder-only
    assert sd and all(k.startswith("encoder.") for k in sd)


def test_state_dict_space_roundtrip():
    """Against the torch reference port: its reference-layout state_dict,
    converted then re-exported, reproduces every key and value — the
    export format IS the reference layout."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_recognizer_e2e import TorchRecognizer

    torch.manual_seed(5)
    sd = TorchRecognizer().eval().reference_style_state_dict()
    # registered buffers the reference recomputes in __init__ are not
    # exported (see export_torch docstring)
    sd = {k: v for k, v in sd.items() if not k.endswith("position_table")}
    rt = export_torch_recognizer(convert_torch_recognizer(sd))
    assert set(rt) == set(sd), (
        sorted(set(sd) - set(rt))[:8], sorted(set(rt) - set(sd))[:8])
    for k in sd:
        if k.startswith("decoder.decoder.gru.bias_"):
            continue  # split differs; sum identity checked above
        np.testing.assert_array_equal(rt[k], np.asarray(sd[k]), err_msg=k)
