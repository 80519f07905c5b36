"""`--model_kind mim_rec`: fine-tuning with the auxiliary SimMIM pixel
branch.  The reference ships `MimRecModel` (models/model_builder.py:
204-290) but never wires it — its encoder call doesn't even typecheck
against the finetune ViT.  Here it is a first-class CLI head family
paired with the masked `PretrainViTEncoder`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dig_tpu.models.rec_model import MimRecModel, build_rec_model
from dig_tpu.train.finetune import init_finetune_state, make_mim_finetune_step


def _make(use_mim_proj=False):
    model = build_rec_model(
        model_name="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        nb_classes=97, max_len=25, model_kind="mim_rec",
        use_mim_proj=use_mim_proj,
    )
    assert isinstance(model, MimRecModel)
    import optax

    state = init_finetune_state(model, optax.adamw(1e-3),
                                jax.random.PRNGKey(0), batch_size=4,
                                max_len=25, model_kind="mim_rec")
    return model, state


@pytest.mark.parametrize("use_mim_proj", [False, True])
def test_mim_step_trains_and_reports_pixel_loss(use_mim_proj):
    model, state = _make(use_mim_proj)
    if use_mim_proj:
        assert "mim_proj" in state.params
    step = make_mim_finetune_step(model, smoothing=0.1, mask_ratio=0.7,
                                  mim_sample_ratio=0.5)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 32, 128, 3)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 97, size=(4, 25)), jnp.int32),
        "lengths": jnp.asarray([4, 6, 3, 25], jnp.int32),
    }
    # snapshot before the step: the jitted step donates the state
    old_pix = np.asarray(state.params["pix_head"]["layers_0"]["kernel"])
    old_dec = np.asarray(state.params["decoder"]["classifier"]["kernel"])
    new_state, metrics, pred_ids = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_pixel"]) > 0.0
    assert np.isfinite(float(metrics["loss_rec"]))
    assert pred_ids.shape == (4, 25)
    # both branches received gradients
    new_pix = np.asarray(new_state.params["pix_head"]["layers_0"]["kernel"])
    assert not np.allclose(old_pix, new_pix)
    new_dec = np.asarray(new_state.params["decoder"]["classifier"]["kernel"])
    assert not np.allclose(old_dec, new_dec)


def test_mim_zero_ratio_has_no_pixel_loss():
    model, state = _make()
    step = make_mim_finetune_step(model, mim_sample_ratio=0.0)
    rng = np.random.default_rng(1)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 32, 128, 3)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 97, size=(4, 25)), jnp.int32),
        "lengths": jnp.asarray([4, 6, 3, 25], jnp.int32),
    }
    _, metrics, _ = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_pixel" not in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_mim_recognize_greedy():
    """Eval path: unmasked encoder -> greedy decode through the standard
    eval step (the reference's tgt=None route)."""
    from dig_tpu.train.finetune import make_eval_step

    model, state = _make()
    eval_fn = make_eval_step(model, beam_width=0, eos=94)
    rng = np.random.default_rng(2)
    batch = {
        "images": jnp.asarray(rng.normal(size=(2, 32, 128, 3)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 97, size=(2, 25)), jnp.int32),
        "lengths": jnp.asarray([4, 6], jnp.int32),
    }
    ids, loss = eval_fn(state.params, batch)
    assert ids.shape == (2, 25)
    assert loss.shape == (2,) and np.isfinite(np.asarray(loss)).all()


def test_mim_rec_rejects_feat_distill():
    """--use_feat_distill would hijack the step-fn branch with a call
    signature only RecModel accepts; the CLI rejects the combination."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    with pytest.raises(ValueError, match="use_feat_distill"):
        main(FinetuneConfig(model_kind="mim_rec", use_feat_distill=True,
                            teacher_ckpt="t", output_dir=""))


@pytest.mark.slow
def test_mim_rec_cli_train_and_eval(tmp_path):
    """End-to-end through the real entry point."""
    import os

    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig
    from tests.test_cli_e2e import encode_jpeg
    from dig_tpu.data.lmdb_store import LmdbWriter

    rng = np.random.default_rng(0)
    lmdb_path = str(tmp_path / "lmdb")
    words = ["cat", "dog", "fish", "bird", "frog", "mouse", "ant", "bee"]
    with LmdbWriter(lmdb_path) as w:
        for i, word in enumerate(words, start=1):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            w.put(b"image-%09d" % i, encode_jpeg(img))
            w.put(b"label-%09d" % i, word.encode())
        w.put(b"num-samples", str(len(words)).encode())

    out = str(tmp_path / "mim")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        model_kind="mim_rec", mim_sample_ratio=0.5, use_mim_proj=True,
        data_path=[lmdb_path], eval_data_path=lmdb_path,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
