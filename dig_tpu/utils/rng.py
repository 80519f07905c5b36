"""Host-built per-step PRNG keys: zero device dispatches on the hot path.

The engines' step functions take a threefry-2x32 key (a ``uint32[2]``
array — what ``jax.random.PRNGKey`` returns) and derive every internal
stream from it *inside* the jitted program.  The textbook driver loop

    step_rng, sub = jax.random.split(step_rng)      # eager device op!

issues one-or-two tiny eager device operations per training step.  On a
normal TPU VM those cost microseconds; over this box's remote-dispatch
relay each eager dispatch costs ~50 ms, which at a 135 ms device step is
a 1.4-1.7x wall-time tax (measured: the pretrain CLI ran 0.44 s/step
against a 0.14 s device step).  Threefry is a strong PRF of (key,
counter), so any scheme that hands the step function a DISTINCT key per
(seed, stream, step) yields independent random streams — the chain of
splits is convention, not a requirement.  Building the key on the host
with numpy costs nanoseconds and no dispatch.

Determinism also improves: the key is a pure function of the global step
index, so a resumed run replays the exact stream schedule of an
uninterrupted one (the split-chain restarts from the root on resume).

Every host passes the same key for the same step — correct for GSPMD
SPMD programs, where per-sample randomness (dropout, view augs) is
derived inside the program from the global key + position, exactly as
with the split-chain convention.  (Reference has no analogue: torch DDP
seeds per-process generators, utils/utils.py seed_worker.)
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative hash / golden-ratio constants: cheap host-side
# mixing so (seed, stream) pairs land far apart in key space.  Threefry
# only needs the keys to be DISTINCT, but mixing costs nothing.
_MULT = np.uint32(2654435761)
_GOLD = np.uint32(0x9E3779B9)


def host_step_key(seed: int, stream: int, step: int) -> np.ndarray:
    """Raw threefry-2x32 key for (seed, stream, step), built on host.

    Drop-in for the ``sub`` of ``step_rng, sub = jax.random.split(...)``:
    pass it straight to a jitted step function, which may split/fold it
    further internally.  ``stream`` separates independent per-step
    consumers (0 = train step, 1 = device view aug, ...).
    """
    hi = (np.uint32(seed & 0xFFFFFFFF) * _MULT) ^ (np.uint32(stream) * _GOLD)
    return np.array([hi, np.uint32(step & 0xFFFFFFFF)], dtype=np.uint32)
