"""Step-resolution schedules, precomputed as arrays and indexed per step.

Parity targets: `cosine_scheduler` (reference: utils/utils.py:522-538) and
`adjust_moco_momentum` (reference: utils/utils.py:540-543).  All schedules
are plain numpy arrays of length ``epochs * steps_per_epoch`` so that a
jitted train step can gather its per-step value with a dynamic index —
no Python control flow inside jit.
"""

from __future__ import annotations

import numpy as np


def cosine_schedule(
    base_value: float,
    final_value: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    """Linear warmup followed by cosine decay, one value per optimizer step."""
    warmup_iters = warmup_epochs * steps_per_epoch
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    total = epochs * steps_per_epoch
    warmup_iters = min(warmup_iters, total)
    if warmup_iters > 0:
        warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    else:
        warmup = np.array([])
    n = total - warmup_iters
    iters = np.arange(n)
    denom = max(n, 1)
    body = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / denom)
    )
    schedule = np.concatenate([warmup, body])
    assert len(schedule) == total
    return schedule.astype(np.float32)


def moco_momentum_schedule(
    moco_m: float, epochs: int, steps_per_epoch: int, use_cosine: bool = True
) -> np.ndarray:
    """Per-step teacher EMA momentum.

    With cosine enabled the momentum ramps ``moco_m -> 1`` following
    ``m(e) = 1 - 0.5 (1 + cos(pi e / E)) (1 - moco_m)`` evaluated at the
    fractional epoch ``epoch + step/steps_per_epoch`` exactly as the
    reference engine does per iteration
    (engine_for_pretraining_moco.py:68-73; utils/utils.py:540-543).
    """
    total = epochs * steps_per_epoch
    if not use_cosine:
        return np.full((total,), moco_m, dtype=np.float32)
    steps = np.arange(total)
    frac_epoch = steps / steps_per_epoch
    m = 1.0 - 0.5 * (1.0 + np.cos(np.pi * frac_epoch / epochs)) * (1.0 - moco_m)
    return m.astype(np.float32)


def contrast_weight_schedule(
    loss_weight: float,
    epochs: int,
    steps_per_epoch: int,
    start_epoch: int = 0,
    warmup_steps: int = 0,
) -> np.ndarray:
    """Contrastive-loss weight ramp (engine_for_pretraining_moco.py:47-56):
    zero before ``start_epoch``, then a linear ramp over ``warmup_steps``
    steps up to ``loss_weight``, then flat."""
    total = epochs * steps_per_epoch
    w = np.zeros((total,), dtype=np.float32)
    start = start_epoch * steps_per_epoch
    if start >= total:
        return w
    ramp = min(warmup_steps, total - start)
    if ramp > 0:
        w[start : start + ramp] = np.linspace(0.0, loss_weight, ramp)
    w[start + ramp :] = loss_weight
    return w
