"""Activation functions tuned for the TPU VPU.

The reference uses torch's default erf-based GELU everywhere
(modeling_finetune.py:43-60, models/transformer_layer.py).  On v5e the
erf lowering is ~5x the cost of the tanh form and does not hide behind
the MXU: a ViT-S MLP chain measures 71 TF/s with erf-GELU vs 149 TF/s
with tanh-GELU (which runs at HBM speed, i.e. free next to the matmuls).
Max |erf - tanh| deviation is ~1e-3 in activation value — training- and
accuracy-neutral (the BERT/GPT-2 lineage trained with the tanh form).

Default: tanh.  For bit-parity with torch ``F.gelu`` (required when
*evaluating* weights trained under erf-GELU, i.e. every converted
reference ``.pth``), set ``DIG_TPU_EXACT_GELU=1`` or call
``set_exact(True)``.  The finetune CLI flips this automatically when
``--finetune``/``--resume`` points at a ``.pth`` (config ``exact_gelu``
overrides).

Trace-time caveat: ``EXACT`` is read when a function is TRACED, not when
it runs — flipping it after ``jax.jit`` has compiled a function has no
effect on that function.  Set it before building/jitting any model code
(``set_exact`` warns if called late).
"""

from __future__ import annotations

import os

import jax

EXACT = bool(os.environ.get("DIG_TPU_EXACT_GELU"))
_TRACED = False


def gelu(x):
    global _TRACED
    _TRACED = True
    return jax.nn.gelu(x, approximate=not EXACT)


def set_exact(value: bool) -> None:
    """Switch between erf (torch-exact) and tanh (TPU-fast) GELU.  Must be
    called before any model function is traced/jitted."""
    global EXACT
    if _TRACED and value != EXACT:
        print("WARNING: set_exact() after model code was already traced; "
              "functions jitted earlier keep the previous GELU form")
    EXACT = value


def resolve_exact_gelu(explicit, checkpoint_paths) -> bool:
    """The finetune CLI's GELU-form decision, in priority order: an
    explicit ``--exact_gelu`` wins; then the ``DIG_TPU_EXACT_GELU`` env
    var (same nonempty-means-on semantics as module init); otherwise erf
    is auto-enabled when any checkpoint path is a torch ``.pth``/``.pt``
    (weights trained under erf-GELU must be evaluated under erf-GELU)."""
    if explicit is not None:
        return bool(explicit)
    if os.environ.get("DIG_TPU_EXACT_GELU"):
        return True
    return any(p.endswith((".pth", ".pt")) for p in checkpoint_paths if p)
