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
        profile_steps=2,  # --profile_steps captures a device trace window
        profile_start_step=1,
    )
    main(cfg)
    assert os.path.isdir(str(tmp_path / "out" / "checkpoint-0"))
    assert os.path.exists(str(tmp_path / "out" / "log.txt"))
    import glob

    assert glob.glob(str(tmp_path / "out" / "profile" / "**" / "*.xplane.pb"),
                     recursive=True)


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
    # machine-readable sweep artifact
    import json

    with open(str(tmp_path / "eval" / "eval_results.json")) as f:
        artifact = json.load(f)
    assert len(artifact["benchmarks"]) == 2
    assert artifact["n_images"] == 32
    assert 0.0 <= artifact["average_acc"] <= 1.0


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


def _reference_recognizer_state_dict(rng):
    """Random-weight state dict in the reference's FINETUNED-checkpoint
    layout (encoder.* + linear_norm.* + decoder.*; shapes for
    vit_micro_patch4_32x128 + small_tf_decoder, 97 classes).  Key names
    follow modeling_finetune.py / models/model_builder.py:85-88 /
    models/decoder.py + models/transformer_layer.py."""
    E, D, H = 64, 2, 2          # encoder micro dims
    DM, DI, NL, NC = 384, 192, 2, 97  # small_tf_decoder dims

    def w(*shape, scale=0.05):
        return rng.normal(size=shape).astype(np.float32) * scale

    sd = {
        "encoder.patch_embed.proj.weight": w(E, 3, 4, 4),
        "encoder.patch_embed.proj.bias": w(E),
        "linear_norm.0.weight": w(DM, E),
        "linear_norm.0.bias": w(DM),
        "linear_norm.1.weight": 1 + w(DM),
        "linear_norm.1.bias": w(DM),
        "decoder.trg_word_emb.weight": w(NC + 1, DM),
        "decoder.layer_norm.weight": 1 + w(DM),
        "decoder.layer_norm.bias": w(DM),
        "decoder.classifier.weight": w(NC, DM),
        "decoder.classifier.bias": w(NC),
        # the sinusoid buffer is recomputed by the converter (skipped)
        "decoder.position_enc.position_table": w(1, 50, DM),
    }
    for i in range(D):
        p = f"encoder.blocks.{i}."
        sd[p + "attn.qkv.weight"] = w(3 * E, E)
        sd[p + "attn.q_bias"] = w(E)
        sd[p + "attn.v_bias"] = w(E)
        sd[p + "attn.proj.weight"] = w(E, E)
        sd[p + "attn.proj.bias"] = w(E)
        for n in ("norm1", "norm2"):
            sd[p + n + ".weight"] = 1 + w(E)
            sd[p + n + ".bias"] = w(E)
        sd[p + "mlp.fc1.weight"] = w(4 * E, E)
        sd[p + "mlp.fc1.bias"] = w(4 * E)
        sd[p + "mlp.fc2.weight"] = w(E, 4 * E)
        sd[p + "mlp.fc2.bias"] = w(E)
    for i in range(NL):
        p = f"decoder.layer_stack.{i}."
        for n in ("norm1", "norm2", "norm3"):
            sd[p + n + ".weight"] = 1 + w(DM)
            sd[p + n + ".bias"] = w(DM)
        for attn in ("self_attn", "enc_attn"):
            for lin in ("linear_q", "linear_k", "linear_v", "fc"):
                sd[p + f"{attn}.{lin}.weight"] = w(DM, DM)
        sd[p + "mlp.w_1.weight"] = w(DI, DM)
        sd[p + "mlp.w_1.bias"] = w(DI)
        sd[p + "mlp.w_2.weight"] = w(DM, DI)
        sd[p + "mlp.w_2.bias"] = w(DM)
    return sd


def test_eval_cli_with_converted_full_pth(fixture_lmdb, tmp_path, capsys):
    """The published-weights path: ``--eval --finetune DiG_finetuned.pth``
    converts the WHOLE reference dict (encoder + linear_norm + decoder),
    grafts every tensor (no skips), auto-enables exact (erf) GELU, and
    greedy-evaluates (reference: run_class_finetuning.py:362-441,
    :557-580)."""
    torch = pytest.importorskip("torch")
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig
    from dig_tpu.ops import activations

    rng = np.random.default_rng(11)
    sd = {k: torch.from_numpy(v) for k, v in
          _reference_recognizer_state_dict(rng).items()}
    pth = str(tmp_path / "DiG_finetuned.pth")
    torch.save({"model": sd}, pth)

    old_exact = activations.EXACT
    try:
        results = main(FinetuneConfig(
            model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
            eval=True, finetune=pth, eval_data_path=fixture_lmdb,
            batch_size=8, output_dir=str(tmp_path / "eval_pth"),
            dtype="float32",
        ))
        assert activations.EXACT is True  # auto-enabled by the .pth
        # beam-search eval sweep over the same converted weights
        # (reference --beam_width, models/decoder.py:254-370)
        beam_results = main(FinetuneConfig(
            model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
            eval=True, finetune=pth, eval_data_path=fixture_lmdb,
            beam_width=2, batch_size=8,
            output_dir=str(tmp_path / "eval_pth_beam"), dtype="float32",
        ))
    finally:
        activations.set_exact(old_exact)
    out = capsys.readouterr().out
    assert "exact (erf) GELU" in out
    # every checkpoint tensor landed on a same-shaped slot
    assert "\nskip " not in out and not out.startswith("skip ")
    assert len(results) == 1 and results[0]["n"] == 16
    assert 0.0 <= results[0]["acc"] <= 1.0
    assert len(beam_results) == 1 and beam_results[0]["n"] == 16


def test_attn_cli_train_and_eval(fixture_lmdb, tmp_path):
    """--model_kind attn: GRU additive-attention head (ASTER-style) trains
    and greedy-evaluates through the CLI (reference AttnRecModel,
    models/model_builder.py:40-72)."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "attn")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", model_kind="attn",
        data_path=[fixture_lmdb], eval_data_path=fixture_lmdb,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))


def test_finetune_cli_device_abi_aug(fixture_lmdb, tmp_path):
    """--device_abi_aug: host pipeline skips cv2 ABI aug; a separately
    jitted batched program augments on device before the train step."""
    from dig_tpu.cli.run_finetune import main
    from dig_tpu.config import FinetuneConfig

    out = str(tmp_path / "dev_abi")
    main(FinetuneConfig(
        model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        data_path=[fixture_lmdb], eval_data_path=fixture_lmdb,
        batch_size=1, epochs=1, warmup_epochs=0, num_workers=2,
        output_dir=out, eval_freq=0, dtype="float32",
        use_abi_aug=True, device_abi_aug=True,
    ))
    assert os.path.isdir(os.path.join(out, "checkpoint-0"))
