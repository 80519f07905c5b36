"""Coverage for secondary components: decoupled/text-conditional decoders,
GRU attention head, CTC model, seq-cls/mem-slot ViT variants, auxiliary
losses, optimizer variants, folder dataset and checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.losses.extra import dino_loss, msn_loss, sinkhorn
from dig_tpu.models.attn_decoder import AttentionRecognitionHead
from dig_tpu.models.decoder import DecoupledTFDecoder, TextCondDecoderLayer, create_decoder
from dig_tpu.models.rec_model import AttnRecModel, CTCRecModel, MimRecModel, build_rec_model
from dig_tpu.models.vit import VisionTransformer
from dig_tpu.optim import create_optimizer, make_optimizer
from dig_tpu.utils.schedules import cosine_schedule


def tiny_enc(**kw):
    d = dict(img_size=(32, 128), patch_size=4, embed_dim=32, depth=1, num_heads=2,
             qkv_bias=True)
    d.update(kw)
    return VisionTransformer(**d)


@pytest.mark.slow
def test_seq_cls_token_vit():
    m = tiny_enc(use_seq_cls_token=True, max_seq_len=7)
    x = jnp.zeros((2, 32, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 7, 32)


def test_mem_slots_vit():
    m = tiny_enc(num_mem_slots=4)
    x = jnp.zeros((2, 32, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 256, 32)  # slots stripped
    m2 = tiny_enc(num_mem_slots=4, use_mem_in_decoder=True)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(v2, x).shape == (2, 260, 32)


@pytest.mark.slow
def test_decoupled_decoder_train():
    dec = DecoupledTFDecoder(num_classes=97, n_layers=1, d_embedding=32, n_head=2,
                             d_k=16, d_v=16, d_model=32, d_inner=64, max_seq_len=5)
    enc = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    targets = jnp.zeros((2, 5), jnp.int32)
    lens = jnp.array([3, 5])
    cls_maps = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (2, 97, 10)))
    variables = dec.init(jax.random.PRNGKey(2), enc, targets, lens, cls_maps, True,
                         method=dec.decoupled_forward)
    logits = dec.apply(variables, enc, targets, lens, cls_maps, True,
                       method=dec.decoupled_forward)
    assert logits.shape == (2, 5, 97)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_text_cond_decoder_layer():
    layer = TextCondDecoderLayer(d_model=32, d_inner=64, n_head=2, d_k=16, d_v=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    v = layer.init(jax.random.PRNGKey(2), x, enc)
    y = layer.apply(v, x, enc)
    assert y.shape == (2, 5, 32)


@pytest.mark.slow
def test_attn_rec_head_train_and_sample():
    head = AttentionRecognitionHead(num_classes=12, s_dim=16, att_dim=16,
                                    max_len_labels=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    targets = jnp.zeros((2, 5), jnp.int32)
    v = head.init(jax.random.PRNGKey(1), x, targets)
    logits = head.apply(v, x, targets)
    assert logits.shape == (2, 5, 12)
    probs, ids = head.apply(v, x, method=head.sample)
    assert probs.shape == (2, 5, 12) and ids.shape == (2, 5)


def test_ctc_model():
    model = CTCRecModel(encoder=tiny_enc(), nb_classes=12)
    x = jnp.zeros((2, 32, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(v, x)
    assert logits.shape == (2, 32, 13)  # width tokens x (classes + blank)


def test_mim_rec_model():
    from dig_tpu.models.decoder import TFDecoder

    dec = TFDecoder(num_classes=12, n_layers=1, d_embedding=32, n_head=2, d_k=16,
                    d_v=16, d_model=32, d_inner=64, max_seq_len=5, dropout=0.0)
    model = MimRecModel(encoder=tiny_enc(), decoder=dec)
    images = jnp.zeros((2, 32, 128, 3))
    targets = jnp.zeros((2, 5), jnp.int32)
    lens = jnp.array([3, 5])
    v = model.init(jax.random.PRNGKey(0), images, targets, lens)
    out = model.apply(v, images, targets, lens)
    assert out["rec_pred"].shape == (2, 5, 12)


def test_mim_rec_model_with_mask():
    # the encoder must be a PretrainViTEncoder to accept masks
    from dig_tpu.models.decoder import TFDecoder
    from dig_tpu.models.vit import PretrainViTEncoder

    enc = PretrainViTEncoder(img_size=(32, 128), patch_size=4, embed_dim=32,
                             depth=1, num_heads=2, qkv_bias=True)
    dec = TFDecoder(num_classes=12, n_layers=1, d_embedding=32, n_head=2, d_k=16,
                    d_v=16, d_model=32, d_inner=64, max_seq_len=5, dropout=0.0)
    model = MimRecModel(encoder=enc, decoder=dec)
    images = jnp.zeros((2, 32, 128, 3))
    targets = jnp.zeros((2, 5), jnp.int32)
    lens = jnp.array([3, 5])
    mask = jnp.zeros((2, 256), bool).at[:, :128].set(True)
    v = model.init(jax.random.PRNGKey(0), images, targets, lens, mask, 1)
    out = model.apply(v, images, targets, lens, mask, 1)
    assert out["pix_pred"].shape == (2, 256, 48)
    assert out["rec_pred"].shape == (2, 5, 12)


def test_build_rec_model_kinds():
    for kind in ("rec", "ctc", "attn"):
        m = build_rec_model(model_name="vit_micro_patch4_32x128",
                            decoder_name="small_tf_decoder", model_kind=kind)
        assert m is not None


def test_dino_loss_centering():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    center = jnp.zeros((1, 16))
    loss, new_center = dino_loss(s, t, center)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(new_center), 0.0)


def test_sinkhorn_rows_normalized():
    scores = jnp.asarray(np.random.default_rng(1).normal(size=(12, 5)).astype(np.float32))
    q = sinkhorn(scores)
    assert np.allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-3)


def test_msn_loss_runs():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    loss, metrics = msn_loss(a, t, protos)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "nadam", "radam",
                                  "rmsprop", "lamb", "lars", "adafactor",
                                  "lookahead_adamw", "fusedadamw",
                                  "adamp", "sgdp"])
def test_optimizer_variants(name):
    lr = cosine_schedule(1e-2, 1e-3, 1, 5)
    tx = create_optimizer(name, lr, momentum=0.9)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert float(jnp.abs(params["w"] - 1.0).sum()) > 0


def test_adamp_projection_orthogonalizes():
    """When a parameter is scale-invariant (grad ⟂ param per channel,
    |cos| < delta/sqrt(dim)), AdamP's projection must (a) remove the
    radial component — the update stays orthogonal to the param — and
    (b) report the shrunk wd_ratio (reference: AdamP _projection,
    wd_ratio=0.01 at optim_factory.py:144)."""
    from dig_tpu.optim import _adamp_projection

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    # build grad orthogonal to p per channel (row)
    g = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = g - p * (p * g).sum(axis=1, keepdims=True) / (p * p).sum(
        axis=1, keepdims=True)
    perturb = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    out, ratio = _adamp_projection(p, g, perturb, delta=0.1, wd_ratio=0.01,
                                   eps=1e-8)
    radial = np.asarray((out * p).sum(axis=1) /
                        jnp.linalg.norm(p, axis=1))
    assert np.abs(radial).max() < 1e-4
    assert float(ratio) == pytest.approx(0.01)

    # non-scale-invariant direction (grad ∥ param): projection is a no-op
    out2, ratio2 = _adamp_projection(p, p, perturb, 0.1, 0.01, 1e-8)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(perturb))
    assert float(ratio2) == pytest.approx(1.0)


def test_adahessian_quadratic():
    """scale_by_adahessian + hutchinson_hessian_diag on a diagonal
    quadratic: the Hutchinson sample is exact (z²=1), so the
    preconditioned update converges like Newton (reference:
    optim_factory.py:154 — a dead flag there; first-class here)."""
    from dig_tpu.optim import hutchinson_hessian_diag, scale_by_adahessian

    A = jnp.asarray([4.0, 1.0, 0.25])
    loss_fn = lambda x: 0.5 * (A * x * x).sum()
    grad_fn = jax.grad(loss_fn)
    x = jnp.asarray([1.0, 1.0, 1.0])
    diag = hutchinson_hessian_diag(grad_fn, x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(diag), np.asarray(A), rtol=1e-6)

    tx = scale_by_adahessian(b1=0.0, b2=0.0)  # no momentum: pure newton dir
    state = tx.init(x)
    u, state = tx.update(grad_fn(x), state, x, hess_diag=diag)
    # update = g / |H| = x elementwise (signs aside) -> one lr=1 step lands at 0
    np.testing.assert_allclose(np.asarray(x - u), 0.0, atol=1e-6)

    # without hess_diag the transform refuses with a pointer
    with pytest.raises(ValueError, match="hutchinson"):
        tx.update(grad_fn(x), state, x)


def test_layer_decay_scales():
    from dig_tpu.optim import layer_scales

    params = {
        "encoder": {
            "patch_embed": {"k": jnp.ones((2, 2))},
            "blocks_0": {"k": jnp.ones((2, 2))},
            "blocks_11": {"k": jnp.ones((2, 2))},
        },
        "decoder": {"k": jnp.ones((2, 2))},
    }
    scales = layer_scales(params, layer_decay=0.5, num_layers=12)
    assert scales["encoder"]["patch_embed"]["k"] == 0.5**13
    assert scales["encoder"]["blocks_0"]["k"] == 0.5**12
    assert scales["encoder"]["blocks_11"]["k"] == 0.5**1
    assert scales["decoder"]["k"] == 0.5**0  # head layer: no decay


def test_folder_dataset(tmp_path):
    import cv2

    from dig_tpu.data.folder import ImageFolder

    for cls in ("a", "b"):
        os.makedirs(tmp_path / cls)
        for i in range(2):
            img = np.random.default_rng(i).integers(0, 255, (20, 40, 3), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / cls / f"{i}.jpg"), img)
    ds = ImageFolder(str(tmp_path))
    assert len(ds) == 4
    img, target = ds[0]
    assert img.shape == (32, 128, 3)
    assert target in (0, 1)


def test_checkpoint_roundtrip(tmp_path):
    from dig_tpu.train.state import TrainState
    from dig_tpu.utils.checkpoint import auto_resume, latest_checkpoint, save_checkpoint

    lr = cosine_schedule(1e-3, 1e-4, 1, 4)
    tx = make_optimizer(lr)
    params = {"w": jnp.ones((4, 4)) * 2.0}
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path), 0, state, extra={"epoch": 0})
    save_checkpoint(str(tmp_path), 3, state, extra={"epoch": 3})
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-3")

    fresh = TrainState.create({"w": jnp.zeros((4, 4))}, tx)
    restored, extra = auto_resume(str(tmp_path), fresh)
    assert int(restored.step) == 7
    assert np.allclose(np.asarray(restored.params["w"]), 2.0)
    assert extra["epoch"] == 3


@pytest.mark.slow
def test_gru_beam_search():
    head = AttentionRecognitionHead(num_classes=12, s_dim=16, att_dim=16,
                                    max_len_labels=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    targets = jnp.zeros((2, 5), jnp.int32)
    v = head.init(jax.random.PRNGKey(1), x, targets)
    # beam-1 equals greedy up to the first EOS freeze
    _, ids_g = head.apply(v, x, method=head.sample)
    ids_b = head.apply(v, x, 1, 9, method=head.beam_search)
    g, bm = np.asarray(ids_g), np.asarray(ids_b)
    for rg, rb in zip(g, bm):
        hits = np.where(rg == 9)[0]
        stop = (hits[0] + 1) if len(hits) else len(rg)
        assert np.array_equal(rg[:stop], rb[:stop])
    ids3 = head.apply(v, x, 3, 9, method=head.beam_search)
    assert ids3.shape == (2, 5)
