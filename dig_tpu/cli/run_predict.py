"""Batch-inference entry point: checkpoint -> recognized text.

The reference framework stops at `--eval` over labeled benchmark LMDBs
(run_class_finetuning.py:557-580); actually *using* a trained recognizer
on new images means writing a loader by hand.  This CLI is the
production-shaped path the reference lacks:

    python -m dig_tpu.cli.run_predict \
        --resume out/checkpoint-best \
        --images crops/ more/*.png single.jpg \
        --output predictions.tsv

    python -m dig_tpu.cli.run_predict \
        --finetune DiG_finetuned.pth --data_path benchmark_lmdb

Inputs may be image files, directories (recursed), globs, and/or LMDBs
in the reference schema (labels ignored).  Output is TSV lines
``name<TAB>text<TAB>confidence`` to stdout or ``--output``.  Decoding is
the same jitted greedy / beam program as evaluation; confidence is the
per-sample geometric mean of the chosen-token probabilities up to EOS
(greedy path; beam emits -1, the reference's beam returns no scores
either, models/decoder.py:254-370).
"""

from __future__ import annotations

import glob
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.config import PredictConfig, config_to_json, parse_config
from dig_tpu.data.dataset import decode_image
from dig_tpu.data.transforms import resize_uint8
from dig_tpu.ops.images import to_model_images
from dig_tpu.utils.charset import build_charset

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif", ".tiff")


def collect_image_paths(specs) -> list:
    """Expand files / directories (recursed) / globs into a deduplicated
    list of image paths; deterministic order (specs in given order, walks
    and globs sorted) so output TSVs are reproducible across machines."""
    def walk(d):
        for root, dirs, files in os.walk(d):
            dirs.sort()  # os.walk order is filesystem-dependent
            yield from (os.path.join(root, f) for f in sorted(files)
                        if f.lower().endswith(IMAGE_EXTS))

    out = []
    for spec in specs:
        if os.path.isdir(spec):
            out.extend(walk(spec))
        elif os.path.isfile(spec):
            out.append(spec)
        else:
            matched = sorted(glob.glob(spec, recursive=True))
            if not matched:
                print(f"[predict] no images match {spec!r}", file=sys.stderr)
            for p in matched:
                if os.path.isdir(p):  # e.g. `crops/*` hitting subdirs:
                    out.extend(walk(p))  # recurse, same as a directory spec
                elif p.lower().endswith(IMAGE_EXTS) or os.path.isfile(p):
                    out.append(p)
    return list(dict.fromkeys(out))


def _prep_batches(pairs, prep, batch_size, num_workers, what):
    """Shared decode/accumulate machinery of the file and LMDB iterators:
    ``pairs`` yields (name, payload); ``prep(payload)`` (run on a thread
    pool) returns an image or None.  Chunked map bounds decoded-image
    memory at O(chunk) even when the consumer (device inference) is
    slower than the decode threads — Executor.map over the full input
    would buffer every completed result.  None results are skipped under
    their own name with a note (the reference dataset's skip-on-corrupt
    behavior, dataset/dataset_lmdb.py:173-177)."""
    import itertools

    chunk = max(batch_size * 8, 64)
    it = iter(pairs)
    with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        names, imgs = [], []
        while part := list(itertools.islice(it, chunk)):
            for (name, _), img in zip(part, pool.map(prep, [p for _, p in part])):
                if img is None:
                    print(f"[predict] skipping unreadable {what} {name!r}",
                          file=sys.stderr)
                    continue
                names.append(name)
                imgs.append(img)
                if len(imgs) == batch_size:
                    yield names, np.stack(imgs)
                    names, imgs = [], []
        if imgs:
            yield names, np.stack(imgs)


def iter_file_batches(paths, batch_size, h, w, num_workers: int = 4):
    """Yield (names, images [B,H,W,3] uint8) batches from image files;
    file IO + decode both run on the pool."""

    def load(p):
        try:
            with open(p, "rb") as f:
                img = decode_image(f.read())
        except OSError:
            img = None
        return None if img is None else resize_uint8(img, h, w)

    yield from _prep_batches(((p, p) for p in paths), load,
                             batch_size, num_workers, "image")


def iter_lmdb_batches(data_paths, batch_size, cfg, num_workers: int = 4):
    """Yield (names, images) batches from LMDBs in the reference schema
    (``image-%09d`` / ``num-samples``).  Records are read DIRECTLY by
    index — labels are never touched (unlabeled LMDBs work) and a
    corrupt/missing record is skipped under its own name, never
    substituted by a neighbor (unlike the training dataset's
    skip-to-next-index behavior, dataset/dataset_lmdb.py:173-187, which
    would misattribute predictions here).

    Record fetches stay on the main thread (the lmdb-pkg backend shares
    one txn, which is not thread-safe — the lazy `pairs` generator is
    pulled chunk-at-a-time by `_prep_batches`); the expensive cv2
    decode+resize runs on the thread pool, so the device never idles on
    host decode."""
    from dig_tpu.data.lmdb_store import LmdbReader

    def prep(buf):
        img = decode_image(buf) if buf is not None else None
        return None if img is None else resize_uint8(
            img, cfg.input_h, cfg.input_w)

    for path in data_paths:
        reader = LmdbReader(path)
        try:
            n_raw = reader.get(b"num-samples")
            if n_raw is None:
                raise ValueError(
                    f"{path!r} has no 'num-samples' key — not a "
                    f"reference-schema LMDB (tools/create_lmdb.py writes "
                    f"it; dataset/dataset_lmdb.py:30 requires it too)")
            pairs = ((f"{path}#{i}", reader.get(b"image-%09d" % i))
                     for i in range(1, int(n_raw) + 1))
            yield from _prep_batches(pairs, prep, batch_size, num_workers,
                                     "record")
        finally:
            reader.close()


def make_predict_fn(model, cfg, eos: int):
    """One jitted program: images -> (ids [B,T], confidence [B])."""

    if cfg.model_kind == "ctc":

        def predict(params, images):
            images = to_model_images(images)  # uint8 transport
            logits = model.apply({"params": params}, images, True)
            probs = jax.nn.softmax(logits, axis=-1)
            ids = jnp.argmax(logits, axis=-1)
            conf = jnp.exp(jnp.mean(jnp.log(jnp.max(probs, axis=-1) + 1e-9), axis=-1))
            return ids, conf

        return jax.jit(predict)

    def predict(params, images):
        images = to_model_images(images)  # uint8 transport
        probs, ids = model.apply({"params": params}, images, cfg.beam_width,
                                 eos, method=model.recognize)
        if probs is None:
            # beam path returns ids only (like the reference beam,
            # models/decoder.py:254-370): rescore with one teacher-forced
            # pass — softmax chain over the chosen ids IS the exact
            # sequence probability, batched and MXU-friendly
            lens = jnp.full((ids.shape[0],), ids.shape[1], jnp.int32)
            logits = model.apply({"params": params}, images, ids, lens, True)
            if isinstance(logits, dict):
                logits = logits["rec_pred"]
            elif isinstance(logits, tuple):
                logits = logits[0]
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        step_p = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]
        t = ids.shape[1]
        is_eos = ids == eos
        has_eos = is_eos.any(axis=1)
        eff_len = jnp.where(has_eos, jnp.argmax(is_eos, axis=1) + 1, t)
        mask = jnp.arange(t)[None, :] < eff_len[:, None]
        logp = jnp.sum(jnp.log(step_p + 1e-9) * mask, axis=1) / eff_len
        return ids, jnp.exp(logp)

    return jax.jit(predict)


def load_params(cfg: PredictConfig, model):
    """Initialize the model tree and overlay checkpoint weights.

    --resume restores a native full-model checkpoint (params only — no
    model init / optimizer allocation needed); --finetune routes through
    the fine-tune surgery (full-recognizer .pth conversion, or
    encoder-only graft for SSL checkpoints)."""
    from dig_tpu.utils.checkpoint import restore_checkpoint

    if cfg.resume:
        return restore_checkpoint(cfg.resume)["params"]

    from dig_tpu.optim import make_optimizer
    from dig_tpu.train.finetune import init_finetune_state

    tx = make_optimizer(np.array([0.0], np.float32))
    state = init_finetune_state(model, tx, jax.random.PRNGKey(cfg.seed),
                                max_len=cfg.max_len, model_kind=cfg.model_kind)
    if cfg.finetune:
        from dig_tpu.cli.run_finetune import load_finetune_init

        return load_finetune_init(cfg, state, model).params
    print("[predict] WARNING: no --resume/--finetune given; "
          "predicting with randomly initialized weights", file=sys.stderr)
    return state.params


def main(cfg: PredictConfig):
    if not cfg.images and not cfg.data_path:
        raise SystemExit("run_predict: provide --images and/or --data_path")
    if cfg.resume.endswith((".pth", ".pt")):
        raise ValueError(
            "--resume expects a native dig_tpu checkpoint directory; "
            f"to load a torch .pth use --finetune (got --resume {cfg.resume})")
    print(config_to_json(cfg), file=sys.stderr)

    # GELU form must be fixed before tracing (see run_finetune.main)
    from dig_tpu.ops import activations

    exact = activations.resolve_exact_gelu(
        cfg.exact_gelu, (cfg.finetune, cfg.resume))
    if exact != activations.EXACT:
        activations.set_exact(exact)

    charset = build_charset(cfg.voc_type, cfg.max_len)
    assert charset.num_classes == cfg.nb_classes, (
        charset.num_classes, cfg.nb_classes)

    from dig_tpu.cli.run_finetune import build_model

    model = build_model(cfg)
    # device_put once: load_params returns host numpy; passing it into the
    # jitted fn would re-upload the full model every batch
    params = jax.device_put(load_params(cfg, model))
    predict_fn = make_predict_fn(model, cfg, eos=charset.eos_id)

    if cfg.model_kind == "ctc":
        from dig_tpu.metrics.text import ctc_decode_batch

        decode = lambda ids: ctc_decode_batch(ids, charset)  # noqa: E731
    else:
        decode = lambda ids: [charset.decode(row) for row in ids]  # noqa: E731

    def batches():
        if cfg.images:
            yield from iter_file_batches(
                collect_image_paths(cfg.images), cfg.batch_size,
                cfg.input_h, cfg.input_w, cfg.num_workers)
        if cfg.data_path:
            yield from iter_lmdb_batches(cfg.data_path, cfg.batch_size, cfg,
                                         cfg.num_workers)

    sink = open(cfg.output, "w") if cfg.output else sys.stdout
    n = 0

    def flush(names, b, ids, conf):
        # np.asarray forces the async device computation here
        texts = decode(np.asarray(ids)[:b])
        for name, text, c in zip(names, texts, np.asarray(conf)[:b]):
            sink.write(f"{name}\t{text}\t{c:.4f}\n")
        return b

    pending = None
    try:
        for names, images in batches():
            b = images.shape[0]
            if b < cfg.batch_size:  # pad to the compiled static shape
                pad = cfg.batch_size - b
                images = np.concatenate(
                    [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
            # dispatch is async: flush the PREVIOUS batch's results while
            # the device runs this one, overlapping host decode+IO with
            # device compute (double buffering)
            ids, conf = predict_fn(params, jnp.asarray(images))
            if pending is not None:
                n += flush(*pending)
            pending = (names, b, ids, conf)
        if pending is not None:
            n += flush(*pending)
    finally:
        if cfg.output:
            sink.close()
    print(f"[predict] recognized {n} images", file=sys.stderr)
    return n


if __name__ == "__main__":
    main(parse_config(PredictConfig))
