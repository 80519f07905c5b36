#!/usr/bin/env python
"""Export a dig_tpu native checkpoint to a reference-layout .pth.

The inverse of ``--finetune checkpoint.pth``: weights trained here load
into the reference ecosystem (run_class_finetuning.py --finetune, whose
surgery consumes ``{"model": state_dict}``; :362-441) for GPU
cross-validation.  Requires CPU torch.

    python tools/export_pth.py out/checkpoint-best dig_export.pth
    python tools/export_pth.py out/checkpoint-9 enc.pth --encoder_only
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dig_tpu.utils.checkpoint import restore_checkpoint  # noqa: E402
from dig_tpu.utils.export_torch import (  # noqa: E402
    export_torch_encoder,
    export_torch_recognizer,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="native checkpoint dir (or gs:// URI)")
    ap.add_argument("output_pth")
    ap.add_argument("--encoder_only", action="store_true",
                    help="export only the ViT encoder (e.g. from an SSL "
                         "checkpoint's student tree)")
    ap.add_argument("--patch_size", type=int, default=4)
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA/momentum params if present")
    args = ap.parse_args()

    import torch

    payload = restore_checkpoint(args.checkpoint)
    params = payload["params"]
    if args.ema:
        if payload.get("ema_params") is None:
            raise SystemExit(
                f"--ema: checkpoint {args.checkpoint} carries no EMA tree")
        params = payload["ema_params"]
    if args.encoder_only:
        enc = params.get("encoder", params)
        sd = export_torch_encoder(enc, patch_size=args.patch_size)
    else:
        sd = export_torch_recognizer(params, patch_size=args.patch_size)
    torch.save({"model": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
               args.output_pth)
    print(f"wrote {len(sd)} tensors -> {args.output_pth}")


if __name__ == "__main__":
    main()
