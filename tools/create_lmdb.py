#!/usr/bin/env python
"""Create recognition LMDB datasets in the reference schema.

Equivalent of the reference's `createDataset` family
(tools/create_mae_lmdb.py:37-85, create_iam_lmdb.py, create_cvl_lmdb.py,
create_opentext_lmdb.py): keys ``image-%09d`` (raw encoded image bytes),
``label-%09d`` (utf-8 text) and ``num-samples``.  Uses the framework's
native LMDB writer, so no liblmdb is needed.

Usage:
    python tools/create_lmdb.py OUTPUT_LMDB --list labels.txt [--root DIR]
        # labels.txt lines: <relative/image/path>\t<label>
    python tools/create_lmdb.py OUTPUT_LMDB --images img1.jpg img2.jpg \
        --labels word1 word2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dig_tpu.data.lmdb_store import LmdbWriter  # noqa: E402


def check_image_valid(buf: bytes) -> bool:
    try:
        import cv2
        import numpy as np

        img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_GRAYSCALE)
        return img is not None and img.shape[0] > 0 and img.shape[1] > 0
    except Exception:
        return False


def create_dataset(output_path: str, image_paths, labels, check_valid: bool = True):
    assert len(image_paths) == len(labels)
    cnt = 1
    with LmdbWriter(output_path) as w:
        for path, label in zip(image_paths, labels):
            if not label:
                continue
            if not os.path.exists(path):
                print(f"{path} does not exist")
                continue
            with open(path, "rb") as f:
                buf = f.read()
            if check_valid and not check_image_valid(buf):
                print(f"{path} is not a valid image")
                continue
            w.put(b"image-%09d" % cnt, buf)
            w.put(b"label-%09d" % cnt, label.encode())
            if cnt % 1000 == 0:
                print(f"processed {cnt}")
            cnt += 1
        n = cnt - 1
        w.put(b"num-samples", str(n).encode())
    print(f"Created dataset with {n} samples at {output_path}")
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--list", help="tsv file: image_path<TAB>label")
    ap.add_argument("--root", default="", help="prefix for relative paths")
    ap.add_argument("--images", nargs="*", default=[])
    ap.add_argument("--labels", nargs="*", default=[])
    ap.add_argument("--no_check", action="store_true")
    args = ap.parse_args()

    if args.list:
        paths, labels = [], []
        with open(args.list) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                p, _, label = line.partition("\t")
                paths.append(os.path.join(args.root, p))
                labels.append(label)
    else:
        paths = [os.path.join(args.root, p) for p in args.images]
        labels = args.labels
    create_dataset(args.output, paths, labels, check_valid=not args.no_check)


if __name__ == "__main__":
    main()
