"""End-to-end CLI smoke tests: pretrain 1 epoch and finetune+eval 1 epoch
on a synthetic LMDB through the real entry points (micro models)."""

import os

import numpy as np
import pytest

from dig_tpu.data.lmdb_store import LmdbWriter

pytestmark = pytest.mark.slow


def encode_jpeg(img):
    import cv2

    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


@pytest.fixture(scope="module")
def fixture_lmdb(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "lmdb")
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "fish", "bird", "frog", "mouse", "ant", "bee",
             "elk", "owl", "bat", "cow", "pig", "hen", "fox", "rat"]
    with LmdbWriter(path) as w:
        for i, word in enumerate(words, start=1):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            w.put(b"image-%09d" % i, encode_jpeg(img))
            w.put(b"label-%09d" % i, word.encode())
        w.put(b"num-samples", str(len(words)).encode())
    return path


def test_pretrain_cli_one_epoch(fixture_lmdb, tmp_path):
    from dig_tpu.cli.run_pretrain import main
    from dig_tpu.config import PretrainConfig

    cfg = PretrainConfig(
        model="pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
        image_alone_path=[fixture_lmdb],
        batch_size=1,  # per device -> 8 per host on the fake 8-dev mesh
        epochs=1,
        warmup_steps=2,
        moco_mlp_dim=32,
        moco_dim=16,
        num_windows=4,
        num_workers=2,
        output_dir=str(tmp_path / "out"),
        save_ckpt_freq=1,
        eval_freq=0,
        dtype="float32",
    )
    main(cfg)
    assert os.path.isdir(str(tmp_path / "out" / "checkpoint-0"))
    assert os.path.exists(str(tmp_path / "out" / "log.txt"))


def test_finetune_from_pretrain_checkpoint(fixture_lmdb, tmp_path):
    """Pretrain 1 epoch, then initialize the recognizer encoder from the
    SSL checkpoint via --finetune (exercises merge_pretrained_encoder)."""
    from dig_tpu.cli.run_finetune import main as ft_main
    from dig_tpu.cli.run_pretrain import main as pre_main
    from dig_tpu.config import FinetuneConfig, PretrainConfig

    pre_out = str(tmp_path / "pre")
    pre_main(PretrainConfig(
        model="pretrain_simmim_moco_ori_vit_micro_patch4_32x128",
        image_alone_path=[fixture_lmdb], batch_size=1, epochs=1,
        warmup_steps=2, moco_mlp_dim=32, moco_dim=16, num_windows=4,
        num_workers=2, output_dir=pre_out, eval_freq=0, dtype="float32",
    ))
    ft_out = str(tmp_path / "ft2")
    ft_main(FinetuneConfig(
        model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        finetune=pre_out + "/checkpoint-0",
        data_path=[fixture_lmdb], eval_data_path="", batch_size=1, epochs=1,
        warmup_epochs=0, num_workers=2, output_dir=ft_out, eval_freq=0,
        dtype="float32",
    ))
    assert os.path.isdir(os.path.join(ft_out, "checkpoint-0"))


def test_finetune_cli_train_and_eval(fixture_lmdb, tmp_path):
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "ft")
    cfg = FinetuneConfig(
        model="vit_micro_patch4_32x128",
        decoder_name="small_tf_decoder",
        data_path=[fixture_lmdb],
        eval_data_path=fixture_lmdb,
        batch_size=1,
        epochs=1,
        warmup_epochs=0,
        num_workers=2,
        output_dir=out,
        eval_freq=0,
        dtype="float32",
        use_abi_aug=True,
    )
    main(cfg)
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))

    # eval-only sweep restoring the checkpoint
    cfg_eval = FinetuneConfig(
        model="vit_micro_patch4_32x128",
        decoder_name="small_tf_decoder",
        eval=True,
        resume=os.path.join(out, "checkpoint-0"),
        eval_data_path=fixture_lmdb,
        other_test_data_folders=[fixture_lmdb],
        batch_size=8,
        output_dir=str(tmp_path / "eval"),
        dtype="float32",
    )
    results = main(cfg_eval)
    assert len(results) == 2
    for r in results:
        assert 0.0 <= r["acc"] <= 1.0 and r["n"] == 16


def test_text_cond_cli_train_and_eval(fixture_lmdb, tmp_path):
    """--text_cond_vis trains one epoch and greedy-evaluates (the reference
    flag run_class_finetuning.py:60 threaded into every decoder layer)."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "tc")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        text_cond_vis=True,
        data_path=[fixture_lmdb], eval_data_path=fixture_lmdb,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))


def test_decoupled_cli_train_and_eval(fixture_lmdb, tmp_path):
    """--decoder_name decoupled_tf_decoder builds a SeqClsRecModel (class
    queries feed the decoupled decoder), trains, and greedy-evaluates
    through the decoupled graph."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "dc")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", decoder_name="decoupled_tf_decoder",
        data_path=[fixture_lmdb], eval_data_path=fixture_lmdb,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))


def test_ctc_cli_train_and_eval(fixture_lmdb, tmp_path):
    """--model_kind ctc: CTC loss train loop + per-frame argmax eval."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "ctc")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", model_kind="ctc",
        data_path=[fixture_lmdb], eval_data_path=fixture_lmdb,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))


def test_finetune_cli_batch_wise_shuffle_two_sources(fixture_lmdb, tmp_path):
    """--batch_wise_shuffle trains over two LMDB sources with per-batch
    source homogeneity (the sampler the reference ships but never wires;
    dist_multisrc_batch_sampler.py:14-154)."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "ft_bw")
    cfg = FinetuneConfig(
        model="vit_micro_patch4_32x128",
        decoder_name="small_tf_decoder",
        data_path=[fixture_lmdb, fixture_lmdb],  # two sources
        eval_data_path=fixture_lmdb,
        batch_size=1,
        epochs=1,
        warmup_epochs=0,
        num_workers=2,
        output_dir=out,
        eval_freq=0,
        dtype="float32",
        batch_wise_shuffle=True,
    )
    main(cfg)
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
