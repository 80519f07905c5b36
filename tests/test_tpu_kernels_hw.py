"""Real-hardware Pallas kernel assertions, as a pytest entry point.

The suite's conftest pins every in-process test to the fake 8-device CPU
backend, so this test shells out to `tools/check_tpu_kernels.py`, which
compares `_pallas_attention` forward + VJP against fp64 truth (fp32) /
`_ref_attention` (bf16) on the real chip (tolerances documented there).

Excluded from default runs (pytest.ini deselects `tpu`); run explicitly:

    python -m pytest tests/test_tpu_kernels_hw.py -m tpu -q

Skips (rather than fails) when no TPU backend is reachable.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
def test_pallas_kernels_on_tpu():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_tpu_kernels.py")],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
    )
    out = proc.stdout + proc.stderr
    if "needs the real TPU backend" in out or "Unable to initialize backend" in out:
        pytest.skip("no TPU backend reachable")
    assert proc.returncode == 0, out
    assert "all TPU kernel checks passed" in out
