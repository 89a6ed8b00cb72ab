"""On-hardware performance gates (SURVEY.md section 5 item 5).

These run OUTSIDE tests/ on purpose: tests/conftest.py pins the whole suite
to the emulated-CPU backend, while these gates are only meaningful on a real
chip.  Run on TPU hardware with

    python -m pytest benchmarks/test_perf_gates.py -q

Both asserted thresholds come from the project baseline (BASELINE.md):
  * fused Voigt+accumulation kernel >= 1e9 (spectral-point x line)/s/chip
    (round-1 measured ~2e10 — the gate is deliberately the *target*, not the
    measured value, so tunnel-timing variance can't flake the suite);
  * full analytic Jacobian <= 5x one forward on the README limb-scan
    scenario (20 tangent heights, 8192 pts, 32 layers, ILS).
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

on_tpu = jax.devices()[0].platform == "tpu"
pytestmark = pytest.mark.skipif(not on_tpu, reason="perf gates need a real TPU chip")


def test_kernel_throughput_gate():
    from bench import BASELINE, bench_kernel
    rate = bench_kernel(on_tpu=True)
    assert rate >= BASELINE, f"kernel at {rate:.3e} evals/s < 1e9 target"


def test_jacobian_cost_gate():
    from bench import bench_limb_scan
    t_fwd, t_jac = bench_limb_scan(on_tpu=True)
    assert t_jac <= 5.0 * t_fwd, (
        f"analytic Jacobian {t_jac * 1e3:.0f} ms > 5x forward "
        f"({t_fwd * 1e3:.0f} ms)")
