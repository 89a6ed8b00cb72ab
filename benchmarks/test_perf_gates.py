"""On-hardware performance gates (SURVEY.md section 5 item 5).

These run OUTSIDE tests/ on purpose: tests/conftest.py pins the whole suite
to the emulated-CPU backend, while these gates are only meaningful on a real
chip.  Run on TPU hardware with

    python -m pytest benchmarks/test_perf_gates.py -q

Asserted thresholds (BASELINE.md + VERDICT.md rounds 1-3):
  * fused Voigt+accumulation kernel >= 1e9 (spectral-point x line)/s/chip
    — the BASELINE.md TARGET gate — AND >= bench.GATE_KERNEL_FLOOR
    (2e10, half the round-3 measurement): the target alone would let a
    10-40x regression pass silently (VERDICT r3 weak item 7);
  * README limb-scan scenario (20 tangent heights, 8192 pts, 32 layers,
    ILS): forward + full 32-column analytic Jacobian device time <=
    bench.GATE_LIMB_SCAN_S (0.30 s = round-4 measured 0.197 s + margin;
    the round-4 engine policy and gather-free RT epilogue cut this metric
    0.509 -> 0.197 s);
  * fused-basis Pallas scenario (2048 lines, same scene): forward + full
    32-column Jacobian device time <= bench.GATE_FUSED_S (0.55 s =
    round-4 measured 0.450 s + margin), and Jacobian <= 8x one forward.  The ratio
    bound is a SANITY check on the fused path, not a target: a broken
    fusion (per-column basis re-evaluation) costs ~32x one forward; the
    measured ratio moves whenever the forward alone gets faster (round 3:
    dead-state skipping cut the forward 2.4x and the Jacobian 1.8x, so the
    ratio ROSE from 2.7x to 3.7x while both absolutes improved — an
    absolute gate is the honest one);
  * mesh composition: the shard_map + pallas forward on one chip must stay
    within 10 % of the plain single-device kernel path
    (bench.GATE_MESH_OVERHEAD_MIN; round 3 measured 1.00x).
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

on_tpu = jax.devices()[0].platform == "tpu"
pytestmark = pytest.mark.skipif(not on_tpu, reason="perf gates need a real TPU chip")


def test_kernel_throughput_gate():
    from bench import BASELINE, GATE_KERNEL_FLOOR, bench_kernel
    rate = bench_kernel(on_tpu=True)
    assert rate >= BASELINE, f"kernel at {rate:.3e} evals/s < 1e9 target"
    assert rate >= GATE_KERNEL_FLOOR, (
        f"kernel at {rate:.3e} evals/s regressed below the "
        f"{GATE_KERNEL_FLOOR:.1e} floor (round-3 measured 4.06e10)")


def test_limb_scan_wall_clock_gate():
    from bench import GATE_LIMB_SCAN_S, bench_limb_scan
    t_fwd, t_jac = bench_limb_scan(on_tpu=True)
    assert t_fwd + t_jac <= GATE_LIMB_SCAN_S, (
        f"limb-scan forward+Jacobian {t_fwd + t_jac:.2f} s regressed past "
        f"the {GATE_LIMB_SCAN_S} s device-time gate (round-4: 0.197 s)")


def test_fused_pallas_jacobian_gate():
    """Production-scale fused-basis scenario (bench.py metric 2): absolute
    device time <= the re-baselined gate, ratio <= 8x as a fused-path
    sanity bound (module docstring explains why the old 3x RATIO gate was
    retired)."""
    from bench import GATE_FUSED_S, bench_fused_pallas
    t_fwd, t_jac = bench_fused_pallas(on_tpu=True)
    print(f"\nfused pallas: fwd {t_fwd * 1e3:.0f} ms, "
          f"jac {t_jac * 1e3:.0f} ms ({t_jac / t_fwd:.2f}x)", file=sys.stderr)
    assert t_fwd + t_jac <= GATE_FUSED_S, (
        f"fused forward+Jacobian {t_fwd + t_jac:.2f} s regressed past the "
        f"{GATE_FUSED_S} s device-time gate (round-4: 0.450 s)")
    assert t_jac <= 8.0 * t_fwd, (
        f"fused Jacobian {t_jac * 1e3:.0f} ms > 8x forward "
        f"({t_fwd * 1e3:.0f} ms) — fusion broken? (naive ~32x)")


def test_mesh_composition_overhead_gate():
    """shard_map + pallas engine on one chip vs the plain kernel path:
    vs_baseline >= 0.9 (VERDICT r3 item 8)."""
    from bench import GATE_MESH_OVERHEAD_MIN, bench_sharded_pallas
    t_mesh, t_single = bench_sharded_pallas(on_tpu=True)
    ratio = t_single / t_mesh
    assert ratio >= GATE_MESH_OVERHEAD_MIN, (
        f"mesh composition overhead: sharded forward {t_mesh * 1e3:.0f} ms "
        f"vs plain {t_single * 1e3:.0f} ms ({ratio:.2f}x < "
        f"{GATE_MESH_OVERHEAD_MIN}) — the shard_map path stopped composing "
        f"cleanly with the kernel")
