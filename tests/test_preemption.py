"""Preemption-safe training (`dig_tpu/utils/preemption.py`): SIGTERM
latches a flag, the CLIs checkpoint at the next step boundary and exit 0,
and auto-resume redoes the interrupted epoch with intact optimizer state.
The reference loses up to ``save_ckpt_freq`` epochs on eviction
(restart + auto-resume only, utils/utils.py:581-669)."""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

from dig_tpu.utils.preemption import PreemptionGuard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_guard_latches_and_uninstalls():
    guard = PreemptionGuard.install()
    try:
        assert not guard.should_stop
        signal.raise_signal(signal.SIGTERM)
        assert guard.should_stop
    finally:
        guard.uninstall()
    # after uninstall the old disposition is back (pytest default: Term)
    assert signal.getsignal(signal.SIGTERM) not in (guard._handler,)


def test_second_signal_falls_back_to_previous_handler():
    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        guard = PreemptionGuard.install()
        try:
            signal.raise_signal(signal.SIGTERM)  # latches
            assert guard.should_stop and not hits
            signal.raise_signal(signal.SIGTERM)  # falls through to prev
            assert hits == [signal.SIGTERM]
        finally:
            guard.uninstall()
    finally:
        signal.signal(signal.SIGTERM, prev)


@pytest.mark.slow
def test_finetune_preempt_checkpoint_and_resume(tmp_path):
    """Real CLI in a subprocess: SIGTERM mid-training -> exit 0 with a
    numeric checkpoint; a rerun auto-resumes and completes."""
    import cv2

    from dig_tpu.data.lmdb_store import LmdbWriter

    rng = np.random.default_rng(0)
    lmdb_path = str(tmp_path / "lmdb")
    with LmdbWriter(lmdb_path) as w:
        for i in range(1, 17):
            img = rng.integers(0, 255, size=(32, 100, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            w.put(b"image-%09d" % i, buf.tobytes())
            w.put(b"label-%09d" % i, b"word")
        w.put(b"num-samples", b"16")

    out = str(tmp_path / "out")
    driver = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
from dig_tpu.cli.run_finetune import main
from dig_tpu.config import FinetuneConfig
print("DRIVER-READY", flush=True)
main(FinetuneConfig(
    model="vit_micro_patch4_32x128", decoder_name="small_tf_decoder",
    data_path=[{lmdb_path!r}], eval_data_path="", batch_size=1, epochs=40,
    warmup_epochs=0, num_workers=2, output_dir={out!r}, eval_freq=0,
    dtype="float32", save_ckpt_freq=1000,
))
"""
    proc = subprocess.Popen([sys.executable, "-c", driver], cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # wait until training has produced at least one epoch line, then preempt
    saw_epoch = False
    for line in proc.stdout:
        if "Epoch: [1]" in line:
            saw_epoch = True
            proc.send_signal(signal.SIGTERM)
            break
    assert saw_epoch, "training never reached epoch 1"
    tail = proc.stdout.read()
    rc = proc.wait(timeout=300)
    assert rc == 0, tail[-2000:]
    assert "preempt" in tail
    cpts = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert cpts, tail[-2000:]

    # rerun with a tiny epoch budget: auto-resume must pick the checkpoint up
    driver2 = driver.replace("epochs=40", "epochs=2")
    done = subprocess.run([sys.executable, "-c", driver2], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert done.returncode == 0, done.stdout[-2000:] + done.stderr[-2000:]
    assert "auto-resumed" in done.stdout


def test_sync_should_stop_cross_host(monkeypatch):
    """A SIGTERM caught by ONE host stops ALL hosts: the flag is reduced
    with a max across processes so the collective checkpoint save and the
    rank-0 write gate line up (single-process path short-circuits)."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    guard = PreemptionGuard()
    assert guard.sync_should_stop() is False  # single-process, no signal

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    calls = []

    def fake_allgather(x):
        calls.append(np.asarray(x))
        # simulate the OTHER host having caught the signal
        return np.stack([np.asarray(x), np.ones_like(np.asarray(x))])

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    assert guard.sync_should_stop() is True
    assert calls and calls[0][0] == 0  # local flag was still unset

    # off-schedule steps skip the collective entirely (deterministic
    # interval — one host must never poll when the others don't)
    n_calls = len(calls)
    assert guard.sync_should_stop(step=7, every=25) is False
    assert len(calls) == n_calls
    # on-schedule steps run it
    assert guard.sync_should_stop(step=50, every=25) is True
    assert len(calls) == n_calls + 1
