"""Batch-inference CLI (`dig_tpu.cli.run_predict`): path collection,
corrupt-file skip, and end-to-end prediction from image files and LMDBs
(a capability the reference lacks — recognition outside --eval requires
hand-rolling a loader around RecModel, models/model_builder.py:124-202)."""

import os

import numpy as np
import pytest

from dig_tpu.cli.run_predict import collect_image_paths, iter_file_batches


def _write_png(path, rng, h=32, w=100):
    import cv2

    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    assert cv2.imwrite(str(path), img)


def test_collect_image_paths(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "sub").mkdir()
    _write_png(tmp_path / "a.png", rng)
    _write_png(tmp_path / "sub" / "b.jpg", rng)
    (tmp_path / "notes.txt").write_text("not an image")
    single = tmp_path / "c.png"
    _write_png(single, rng)

    # directory recursion skips non-images; explicit file + glob + dedup
    paths = collect_image_paths([str(tmp_path), str(single),
                                 str(tmp_path / "*.png")])
    names = [os.path.basename(p) for p in paths]
    assert sorted(names) == ["a.png", "b.jpg", "c.png"]
    assert len(paths) == len(set(paths))

    # a glob that matches a DIRECTORY recurses into it like a dir spec
    # (crops/* with image subfolders must not silently drop them)
    paths = collect_image_paths([str(tmp_path / "s*")])
    assert [os.path.basename(p) for p in paths] == ["b.jpg"]


def test_iter_file_batches_skips_corrupt(tmp_path, capsys):
    rng = np.random.default_rng(1)
    good = [tmp_path / f"g{i}.png" for i in range(3)]
    for p in good:
        _write_png(p, rng)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image at all")

    paths = [str(good[0]), str(bad), str(good[1]), str(good[2])]
    batches = list(iter_file_batches(paths, batch_size=2, h=32, w=128))
    names = [n for batch_names, _ in batches for n in batch_names]
    assert names == [str(good[0]), str(good[1]), str(good[2])]
    assert batches[0][1].shape == (2, 32, 128, 3)
    assert batches[1][1].shape == (1, 32, 128, 3)
    # uint8 transport: predict ships raw uint8 and normalizes in-jit
    # (ops/images.to_model_images; see test_uint8_transport.py)
    assert batches[0][1].dtype == np.uint8


def test_iter_lmdb_batches_unlabeled_and_no_substitution(tmp_path):
    """LMDB records are read directly by index: label-less LMDBs work, and
    a corrupt record is skipped under its OWN name — never replaced by a
    neighbor (the training dataset's skip-to-next-index would misattribute
    predictions here)."""
    import cv2

    from dig_tpu.cli.run_predict import iter_lmdb_batches
    from dig_tpu.config import PredictConfig
    from dig_tpu.data.lmdb_store import LmdbWriter

    rng = np.random.default_rng(5)
    path = str(tmp_path / "lmdb")
    with LmdbWriter(path) as w:
        for i in (1, 3):  # no labels at all; record 2 is corrupt
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            w.put(b"image-%09d" % i, buf.tobytes())
        w.put(b"image-%09d" % 2, b"corrupt bytes")
        w.put(b"num-samples", b"3")

    cfg = PredictConfig(input_h=32, input_w=128)
    batches = list(iter_lmdb_batches([path], batch_size=4, cfg=cfg))
    names = [n for batch_names, _ in batches for n in batch_names]
    assert names == [f"{path}#1", f"{path}#3"]
    assert batches[0][1].shape == (2, 32, 128, 3)


def test_predict_resume_pth_rejected(tmp_path):
    from dig_tpu.cli.run_predict import main
    from dig_tpu.config import PredictConfig

    with pytest.raises(ValueError, match="native dig_tpu checkpoint"):
        main(PredictConfig(resume="weights.pth", images=[str(tmp_path)]))


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    """Save a native recognizer checkpoint, then predict over a folder of
    images and an LMDB through the real entry point; output is TSV
    name\\ttext\\tconfidence with confidence in (0, 1]."""
    import jax

    from dig_tpu.cli.run_finetune import build_model
    from dig_tpu.cli.run_predict import main
    from dig_tpu.config import PredictConfig
    from dig_tpu.data.lmdb_store import LmdbWriter
    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.finetune import init_finetune_state
    from dig_tpu.utils.checkpoint import save_checkpoint

    cfg = PredictConfig(
        model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
        batch_size=4, dtype="float32",
        output=str(tmp_path / "pred.tsv"),
    )
    model = build_model(cfg)
    tx = make_optimizer(np.array([0.0], np.float32))
    state = init_finetune_state(model, tx, jax.random.PRNGKey(0),
                                max_len=cfg.max_len)
    save_checkpoint(str(tmp_path / "ckpt"), "best", state, extra={})
    cfg.resume = str(tmp_path / "ckpt" / "checkpoint-best")

    rng = np.random.default_rng(2)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):  # 5 files -> one full batch of 4 + padded batch of 1
        _write_png(img_dir / f"w{i}.png", rng)
    cfg.images = [str(img_dir)]

    import cv2

    lmdb_path = str(tmp_path / "lmdb")
    with LmdbWriter(lmdb_path) as w:
        for i in range(1, 4):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            w.put(b"image-%09d" % i, buf.tobytes())
            w.put(b"label-%09d" % i, b"abc")
        w.put(b"num-samples", b"3")
    cfg.data_path = [lmdb_path]

    n = main(cfg)
    assert n == 8
    lines = (tmp_path / "pred.tsv").read_text().strip().split("\n")
    assert len(lines) == 8
    for line in lines:
        name, text, conf = line.split("\t")
        assert 0.0 < float(conf) <= 1.0
        assert isinstance(text, str)
    # file names and lmdb#index names both present
    assert sum(1 for ln in lines if "#" in ln.split("\t")[0]) == 3


@pytest.mark.slow
def test_predict_cli_beam_and_ctc(tmp_path):
    """Beam path emits a real confidence via teacher-forced rescoring
    (the reference beam returns no scores); CTC decodes through the
    collapse rule."""
    import jax

    from dig_tpu.cli.run_finetune import build_model
    from dig_tpu.cli.run_predict import main
    from dig_tpu.config import PredictConfig
    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.finetune import init_finetune_state
    from dig_tpu.utils.checkpoint import save_checkpoint

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        _write_png(img_dir / f"w{i}.png", rng)

    for kind, extra in (("rec", dict(beam_width=2)), ("ctc", {})):
        cfg = PredictConfig(
            model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
            model_kind=kind, batch_size=2, dtype="float32",
            images=[str(img_dir)],
            output=str(tmp_path / f"pred_{kind}.tsv"), **extra,
        )
        model = build_model(cfg)
        tx = make_optimizer(np.array([0.0], np.float32))
        state = init_finetune_state(model, tx, jax.random.PRNGKey(1),
                                    max_len=cfg.max_len, model_kind=kind)
        out = str(tmp_path / f"ckpt_{kind}")
        save_checkpoint(out, "f", state, extra={})
        cfg.resume = os.path.join(out, "checkpoint-f")
        assert main(cfg) == 2
        lines = (tmp_path / f"pred_{kind}.tsv").read_text().strip().split("\n")
        assert len(lines) == 2
        confs = [float(ln.split("\t")[2]) for ln in lines]
        assert all(0.0 < c <= 1.0 for c in confs)
