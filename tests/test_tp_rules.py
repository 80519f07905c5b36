"""Tensor-parallel sharding rules on a tensor=2 CPU mesh: enumerate the
full parameter trees of the pretrain model and the recognizer and assert
every >=2-D transformer-block kernel gets its intended spec (fails on any
expected-sharded leaf left replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dig_tpu.parallel.mesh import (
    TP_COLUMN_RULES,
    TP_ROW_RULES,
    _endswith,
    _path_keys,
    create_mesh,
    tp_param_shardings,
)


@pytest.fixture(scope="module")
def tp_mesh():
    return create_mesh(n_data=2, n_fsdp=2, n_tensor=2,
                       devices=jax.devices()[:8])


def _rec_params():
    from dig_tpu.models.rec_model import build_rec_model

    model = build_rec_model(model_name="vit_micro_patch4_32x128",
                            decoder_name="small_tf_decoder", nb_classes=12,
                            max_len=5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)),
                   jnp.zeros((1, 5), jnp.int32), jnp.full((1,), 5), True)
    return v["params"]


def _pretrain_params():
    from dig_tpu.models.moco import DiGPretrainModel

    model = DiGPretrainModel(
        img_size=(32, 128), patch_size=4, encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=2, decoder_num_classes=48,
        decoder_embed_dim=32, mlp_dim=128, dim=32, num_windows=4,
        qkv_bias=True, use_pixel_target=True, use_moco_target=True,
    )
    images = jnp.zeros((2, 32, 128, 3), jnp.float32)
    mask = jnp.zeros((2, 256), bool)
    v = model.init(jax.random.PRNGKey(0), images, mask, True)
    return v["params"]


def _check_tree(params, mesh):
    shardings = tp_param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(shardings)
    col_spec_last = "tensor"
    n_col = n_row = 0
    for (path, leaf), sh in zip(flat, flat_s):
        keys = _path_keys(path)
        spec = sh.spec
        is_col = any(_endswith(keys, c) for c in TP_COLUMN_RULES)
        is_row = any(_endswith(keys, r) for r in TP_ROW_RULES)
        name = "/".join(keys)
        if leaf.ndim >= 2 and is_col and leaf.shape[-1] % 2 == 0:
            assert spec[-1] == col_spec_last, f"{name}: {spec} (want col)"
            n_col += 1
        elif leaf.ndim >= 2 and is_row and not is_col and leaf.shape[0] % 2 == 0:
            assert spec[0] == "tensor", f"{name}: {spec} (want row)"
            n_row += 1
        elif leaf.ndim < 2 or not (is_col or is_row):
            assert spec == P(), f"{name}: {spec} (want replicated)"
    return n_col, n_row


def test_rec_model_tp_specs(tp_mesh):
    params = _rec_params()
    n_col, n_row = _check_tree(params, tp_mesh)
    # every ViT block has qkv + MLP-up; every decoder layer has 2 MHA
    # (3 projections each) + FFN-up: micro encoder = 2 blocks,
    # small_tf_decoder = 2 layers
    assert n_col >= 2 * 2 + 2 * (2 * 3 + 1), (n_col, n_row)
    assert n_row >= 2 * 2 + 2 * (2 + 1), (n_col, n_row)


def test_pretrain_model_tp_specs(tp_mesh):
    params = _pretrain_params()
    n_col, n_row = _check_tree(params, tp_mesh)
    # student tree only (the EMA branch is a separate tree in TrainState):
    # 2 ViT blocks (qkv + MLP-up) + 2 PatchNet blocks (q/k/v + MLP-up)
    assert n_col >= 2 * 2 + 2 * 4 and n_row >= 2 * 2, (n_col, n_row)


def test_no_expected_leaf_left_replicated(tp_mesh):
    """Adversarial completeness check: any >=2-D kernel that lives inside
    an attention or MLP module of a transformer block MUST be covered by
    a column or row rule — catches silent rule drift after renames."""
    params = _rec_params()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    uncovered = []
    for path, leaf in flat:
        keys = _path_keys(path)
        inside_block = any(k.startswith(("blocks_", "layers_")) for k in keys)
        is_kernel = keys[-1] in ("kernel", "qkv_kernel")
        if leaf.ndim >= 2 and inside_block and is_kernel:
            covered = any(_endswith(keys, c) for c in TP_COLUMN_RULES) or any(
                _endswith(keys, r) for r in TP_ROW_RULES)
            if not covered:
                uncovered.append("/".join(keys))
    assert not uncovered, f"block kernels without a TP rule: {uncovered}"


def test_tp_forward_executes(tp_mesh):
    """A TP-sharded recognizer forward actually runs under the mesh
    (GSPMD inserts the collectives)."""
    params = _rec_params()
    shardings = tp_param_shardings(tp_mesh, params)
    params = jax.device_put(params, shardings)
    from dig_tpu.models.rec_model import build_rec_model

    model = build_rec_model(model_name="vit_micro_patch4_32x128",
                            decoder_name="small_tf_decoder", nb_classes=12,
                            max_len=5)

    @jax.jit
    def fwd(p, images, targets, lens):
        return model.apply({"params": p}, images, targets, lens, True)

    logits = fwd(params, jnp.zeros((8, 32, 128, 3)),
                 jnp.zeros((8, 5), jnp.int32), jnp.full((8,), 5))
    assert np.isfinite(np.asarray(logits)).all()


def test_tp_composes_with_fsdp_base(tp_mesh):
    """With base=fsdp tree, TP-matched leaves get the tensor sharding and
    every other leaf KEEPS its fsdp sharding (no silent replication)."""
    from dig_tpu.parallel.mesh import fsdp_param_shardings

    params = _rec_params()
    fsdp = fsdp_param_shardings(tp_mesh, params, min_size=1)
    composed = tp_param_shardings(tp_mesh, params, base=fsdp)

    flat_f = jax.tree_util.tree_flatten_with_path(fsdp)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(composed)[0]
    n_tp, n_kept = 0, 0
    for (path, f), (_, c) in zip(flat_f, flat_c):
        keys = _path_keys(path)
        tp_match = any(_endswith(keys, r) for r in TP_COLUMN_RULES) or any(
            _endswith(keys, r) for r in TP_ROW_RULES)
        if tp_match and any(e == "tensor" for e in tuple(c.spec)):
            n_tp += 1
        elif not tp_match:
            assert c.spec == f.spec, "/".join(keys)
            n_kept += 1
    assert n_tp > 0 and n_kept > 0
