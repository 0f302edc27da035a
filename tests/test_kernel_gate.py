"""The on-device kernel correctness gate (mlsgpu_tpu/ops/kernel_gate.py).

Two tiers:
* the gate LOGIC runs everywhere (interpret mode on the CPU backend);
* the compiled-on-hardware run (`python -m mlsgpu_tpu.ops.kernel_gate`)
  is exercised in a subprocess only when the TPU backend answers a
  bounded probe — the suite must never eat the ~25-minute init hang a
  dead tunnel causes (see bench.probe_backend).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_gate_logic_interpret():
    from mlsgpu_tpu.ops.kernel_gate import run_kernel_gate
    summary = run_kernel_gate("sphere", interpret=True)
    assert summary["defined_corners"] > 500
    assert summary["max_abs_err"] < 1e-3


def test_gate_detects_divergence(monkeypatch):
    """A corrupted kernel output must fail the gate (the gate is only a
    gate if it can reject)."""
    import numpy as np

    from mlsgpu_tpu.ops import kernel_gate, mls_pallas

    real = mls_pallas.eval_field_pallas

    def corrupt(*a, **kw):
        field, mt, n_occ = real(*a, **kw)
        return field + 0.01, mt, n_occ

    monkeypatch.setattr(mls_pallas, "eval_field_pallas", corrupt)
    with pytest.raises(AssertionError, match="kernel gate"):
        kernel_gate.run_kernel_gate("sphere", interpret=True)


def test_gate_compiled_on_device():
    """Run the compiled gate on real hardware when the backend is up
    (bounded probe, auto-skip otherwise)."""
    env = {k: v for k, v in os.environ.items()
           if k != "MLSGPU_TPU_FORCE_CPU"}
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() != 'cpu'"],
            timeout=180, cwd=REPO, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        pytest.skip("device backend probe timed out (tunnel down)")
    if probe.returncode != 0:
        pytest.skip("no non-CPU backend available")
    proc = subprocess.run(
        [sys.executable, "-m", "mlsgpu_tpu.ops.kernel_gate"],
        timeout=1500, cwd=REPO, env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout
