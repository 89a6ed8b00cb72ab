#!/usr/bin/env python
"""Headline benchmarks on one chip (BASELINE.json:2 — both metrics, plus
the round-3 production-engine captures).

1. Limb-scan wall-clock: Mars limb forward model (20 tangent heights,
   8192 spectral points, 32 layers, ILS) + full analytic Jacobian over the
   32-parameter temperature profile — the end-to-end production economics
   at 161 lines (round 4: the Pallas engine, which now wins at every
   measured line count on TPU — see cli._engine; round-3 numbers used the
   XLA scan here).
2. Fused-engine wall-clock (VERDICT.md round-2 weak item 2): the SAME
   scene at production scale (2048 lines) with engine='pallas' — forward +
   fused in-kernel {K, Kx, xKx, Ky} analytic Jacobian, the framework's
   centerpiece, so the driver tracks it between rounds.
3. Sharded+pallas forward (VERDICT.md round-2 item 1 'done' criterion):
   the shard_map mesh path with the Pallas engine inside the body on the
   one real chip (a (1,1,1) mesh — the composition, not the scaling).
4. Kernel throughput: (spectral-point x line) evaluations per second per
   chip, dense evaluation (every pair evaluated — the honest denominator),
   on the fused Voigt+accumulation Pallas kernel (ops/pallas_opacity.py).
   Baseline: the project target >= 1e9 evals/s/chip (BASELINE.md; the
   reference publishes no numbers).

TIMING METHODOLOGY (round 3): each metric times N data-dependent calls
CHAINED INSIDE ONE JITTED DISPATCH (lax.fori_loop whose carry feeds a
zero-scaled output scalar back into the next call's input, so XLA can
neither CSE the iterations nor overlap them).  Per-call device time is
wall/N.  Rationale: this chip is reached through a tunnel whose
per-dispatch latency was measured at 10-40 ms and VARIES 2-4x between
rounds — host-loop timings of a ~8 ms kernel reported tunnel weather, not
kernel changes (round-2's 16.4 ms/call "median of 5" vs a chained-device
8.2 +/- 0.1 ms for the identical compiled kernel).  On a normal TPU host
dispatch is ~100 us and the two methods agree.  min over n_rep dispatches
guards the residual one-sided host noise.

Prints one JSON line per metric; the kernel-throughput headline metric is
the LAST line (the driver's primary capture).  Diagnostics go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BASELINE = 1.0e9  # evals/s/chip target (BASELINE.md)
# Round-1 measured wall-clock for the limb-scan scenario (README): the
# vs_baseline denominator so the driver sees regressions between rounds.
# (Rounds 1-2 timed host loops; the tunnel-latency share of those numbers
# is documented in the module docstring.)
BASELINE_LIMB_SCAN_S = 0.80  # forward + full analytic Jacobian, v5e
# Round-2 measured fused-engine wall-clock at 2048 lines (README: fwd
# 434 ms + fused Jacobian 1184 ms on v5e) — the regression denominator for
# the production-scale pallas scenario.
BASELINE_FUSED_S = 1.62

# GATE constants (benchmarks/test_perf_gates.py) — round-3 DEVICE-TIME
# measurements (BENCH_r03.json: limb 0.509 s, fused 0.627 s, kernel
# 4.06e10) plus ~25-30 % tunnel-variance margin.  The old host-loop
# baselines above stay as vs_baseline denominators for trend continuity,
# but gating against them would let a ~2x device-time regression pass
# (round-3 ADVICE item 1): a chained-dispatch measurement must be gated
# against a chained-dispatch baseline.
GATE_LIMB_SCAN_S = 0.30  # round-4 gather-free RT 0.197 s + ~50% margin
# Round 5: dispatch sub-blocking brought the fused scenario to 0.438 s,
# and the roofline metric shows the kernel's Voigt evaluation at ~the
# measured VPU elementwise ceiling (bench_roofline) — i.e. the remaining
# time is genuine compute, not scheduling headroom — so the gate tightens
# to 0.55 (0.438 + ~25% tunnel-variance margin).
GATE_FUSED_S = 0.55
# Regression FLOOR for the kernel gate (VERDICT r3 weak item 7): the 1e9
# target alone would let a 10-40x kernel regression pass silently; half
# the round-5 measurement (4.4e10) actually guards the achieved level.
GATE_KERNEL_FLOOR = 2.2e10
# Mesh-composition overhead gate: sharded+pallas on one chip must stay
# within 10 % of the plain single-device kernel path (round 3: 1.00x).
GATE_MESH_OVERHEAD_MIN = 0.90


def device_time(fn, x0, perturb, n_iter: int, n_rep: int) -> float:
    """Per-call device seconds for ``fn(x)``: n_iter calls chained in ONE
    jitted dispatch (see module docstring), min over n_rep dispatches.

    ``perturb(x, s)`` must fold the zero scalar ``s`` into a fresh input so
    iteration i+1 data-depends on iteration i's output.
    """
    @jax.jit
    def run(x):
        out0 = fn(x)

        def body(_, carry):
            xx, _out = carry
            out = fn(xx)
            s = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
            # nan_to_num before the zero-scale: 0.0 * Inf/NaN is NaN, which
            # would poison iterations 2..N (and flip amps!=0 active masks,
            # silently measuring a different workload — round-3 ADVICE).
            s = jnp.nan_to_num(s, nan=0.0, posinf=0.0, neginf=0.0)
            return perturb(xx, 0.0 * s), out

        return jax.lax.fori_loop(1, n_iter, body, (x, out0))[1]

    jax.block_until_ready(run(x0))
    times = []
    for _ in range(n_rep):
        t0 = time.time()
        jax.block_until_ready(run(x0))
        times.append((time.time() - t0) / n_iter)
    return min(times)


def _perturb_flat(x, s):
    return x + s.astype(x.dtype)


def bench_limb_scan(on_tpu: bool) -> tuple:
    """Mars limb scan: 20 tangent heights, 8192 pts, 32 layers, ILS;
    forward + full analytic Jacobian (32 T-profile parameters)."""
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band
    from spectrobot_tpu.ops.ils import ils_matrix
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.retrieval.state import (
        build_forward, flatten_state, jacobian_fwd_chunked, make_state)

    P, n_lev, n_rays = (8192, 32, 20) if on_tpu else (1024, 8, 4)
    ll = co2_15um_band(j_max=80)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32)
    atm = mars_standard_atmosphere(n_lev=n_lev, z_top=80e3)
    nu64 = np.linspace(600.0, 750.0, P)
    nu = jnp.asarray(nu64, jnp.float32)
    nu_off = jnp.asarray(nu64 - float(dl.nu_ref), jnp.float32)
    ths = jnp.asarray(np.linspace(5e3, 70e3, n_rays), jnp.float32)
    chans = np.linspace(605.0, 745.0, 256)
    W = jnp.asarray(ils_matrix(nu64, chans, fwhm=0.8), jnp.float32)

    # Production engine policy (cli._engine): pallas on TPU at any size.
    fwd = build_forward(atm, dl, nu, ["CO2"], MARS, tangent_heights_m=ths,
                        ils_W=W, nu_off=nu_off,
                        engine="pallas" if on_tpu else "jnp",
                        interpret=False)
    state = make_state(atm, retrieve_vmr=[])
    x0, unravel = flatten_state(state)
    fwd_flat = lambda x: fwd(unravel(x))
    jac = lambda x: jacobian_fwd_chunked(fwd_flat, x, chunk=32)

    t0 = time.time()
    jax.block_until_ready((jax.jit(fwd_flat)(x0), jax.jit(jac)(x0)))
    print(f"limb scan compile+first run: {time.time() - t0:.1f}s "
          f"({n_rays} rays, {P} pts, {n_lev} lev, {ll.nu0.shape[0]} lines)",
          file=sys.stderr)
    n_iter, n_rep = (10, 3) if on_tpu else (1, 1)
    t_fwd = device_time(fwd_flat, x0, _perturb_flat, n_iter, n_rep)
    t_jac = device_time(jac, x0, _perturb_flat, n_iter, n_rep)
    wall = t_fwd + t_jac
    print(f"forward {t_fwd * 1e3:.1f} ms  jacobian {t_jac * 1e3:.1f} ms "
          f"({t_jac / t_fwd:.1f}x fwd) [device time, {n_iter} chained]",
          file=sys.stderr)
    print(json.dumps({
        "metric": "limb_scan_forward_jacobian_wall_s",
        "value": wall,
        "unit": "s device time (forward + 32-column analytic Jacobian)",
        "vs_baseline": BASELINE_LIMB_SCAN_S / wall,  # >1 means faster
    }))
    return t_fwd, t_jac


def bench_fused_pallas(on_tpu: bool) -> tuple:
    """Production-scale fused-engine scenario (same as
    benchmarks/test_perf_gates.py::test_fused_pallas_jacobian_gate):
    2048 random lines, 8192 points, 20 rays, 32 layers, ILS — forward +
    full 32-column analytic Jacobian, both THROUGH the Pallas kernel and
    its in-kernel basis contraction."""
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.ils import ils_matrix
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.retrieval.state import (
        build_forward, flatten_state, jacobian_fwd_chunked, make_state)

    P, n_lev, n_rays, L = (8192, 32, 20, 2048) if on_tpu else (512, 6, 2, 256)
    ll = random_lines(L, 600.0, 750.0, seed=3)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32)
    atm = mars_standard_atmosphere(n_lev=n_lev, z_top=80e3)
    nu64 = np.linspace(600.0, 750.0, P)
    nu = jnp.asarray(nu64, jnp.float32)
    nu_off = jnp.asarray(nu64 - float(dl.nu_ref), jnp.float32)
    ths = jnp.asarray(np.linspace(5e3, 70e3, n_rays), jnp.float32)
    W = jnp.asarray(ils_matrix(nu64, np.linspace(605.0, 745.0, 256), 0.8),
                    jnp.float32)
    fwd = build_forward(atm, dl, nu, ["CO2"], MARS, tangent_heights_m=ths,
                        ils_W=W, nu_off=nu_off, engine="pallas",
                        interpret=not on_tpu)
    x0, unravel = flatten_state(make_state(atm, retrieve_vmr=[]))
    fwd_flat = lambda x: fwd(unravel(x))
    jac = lambda x: jacobian_fwd_chunked(fwd_flat, x, chunk=32)

    t0 = time.time()
    jax.block_until_ready((jax.jit(fwd_flat)(x0), jax.jit(jac)(x0)))
    print(f"fused-engine compile+first run: {time.time() - t0:.1f}s "
          f"({L} lines, engine=pallas)", file=sys.stderr)
    n_iter, n_rep = (5, 3) if on_tpu else (1, 1)
    t_fwd = device_time(fwd_flat, x0, _perturb_flat, n_iter, n_rep)
    t_jac = device_time(jac, x0, _perturb_flat, n_iter, n_rep)
    wall = t_fwd + t_jac
    print(f"fused pallas @{L} lines: fwd {t_fwd * 1e3:.1f} ms  "
          f"jac {t_jac * 1e3:.1f} ms ({t_jac / t_fwd:.2f}x fwd) "
          f"[device time, {n_iter} chained]", file=sys.stderr)
    print(json.dumps({
        "metric": "fused_pallas_forward_jacobian_wall_s",
        "value": wall,
        "unit": f"s device time (fwd + 32-col fused-basis Jacobian, "
                f"{L} lines, pallas)",
        "vs_baseline": BASELINE_FUSED_S / wall,  # >1 means faster
    }))
    return t_fwd, t_jac


def bench_sharded_pallas(on_tpu: bool) -> tuple:
    """The mesh path with the Pallas engine INSIDE the shard_map body on
    the available chip(s) — captures that the kernel and the mesh compose
    on hardware (VERDICT.md round-2 item 1); on one chip the mesh is
    (1, 1, 1), so vs_baseline reports the composition overhead against the
    plain single-device pallas forward."""
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.forward.limb import limb_radiance
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.parallel.mesh import make_mesh
    from spectrobot_tpu.parallel.sharded import (
        pad_lines_for_mesh, sharded_radiance_fn, stage_sharded)

    P, n_lev, n_rays, L = (8192, 32, 20, 2048) if on_tpu else (512, 6, 2, 256)
    ll = random_lines(L, 600.0, 750.0, seed=3)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32)
    atm = mars_standard_atmosphere(n_lev=n_lev, z_top=80e3)
    nu64 = np.linspace(600.0, 750.0, P)
    nu = jnp.asarray(nu64, jnp.float32)
    nu_off = jnp.asarray(nu64 - float(dl.nu_ref), jnp.float32)
    ths = jnp.asarray(np.linspace(5e3, 70e3, n_rays), jnp.float32)
    cg = limb_path_cg(atm, ["CO2"], ths, MARS, 4)

    n_dev = len(jax.devices())
    mesh = make_mesh((1, 1, n_dev))
    f = sharded_radiance_fn(mesh, has_nlte=False, has_background=False,
                            engine="pallas", interpret=not on_tpu,
                            win_grid=np.asarray(nu_off),
                            win_lines=np.asarray(dl.nu0))
    nu_s, lines_s, cg_s, _, _ = stage_sharded(
        mesh, nu, pad_lines_for_mesh(dl, 1), cg)

    # Chain through the CG column amounts (first pytree leaf with ndim>=1).
    def _perturb_cg(c, s):
        return jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype), c)

    mesh_fn = lambda c: f(nu_s, lines_s, c, nu_off=nu_off)
    single_fn = lambda c: limb_radiance(nu, dl, c, nu_off=nu_off,
                                        engine="pallas",
                                        interpret=not on_tpu)
    jax.block_until_ready((jax.jit(mesh_fn)(cg_s), jax.jit(single_fn)(cg)))
    n_iter, n_rep = (5, 3) if on_tpu else (1, 1)
    t_mesh = device_time(mesh_fn, cg_s, _perturb_cg, n_iter, n_rep)
    t_single = device_time(single_fn, cg, _perturb_cg, n_iter, n_rep)
    print(f"sharded+pallas forward: {t_mesh * 1e3:.1f} ms on a "
          f"(1, 1, {n_dev}) mesh vs {t_single * 1e3:.1f} ms plain "
          f"({t_single / t_mesh:.2f}x) [device time, {n_iter} chained]",
          file=sys.stderr)
    print(json.dumps({
        "metric": "sharded_pallas_forward_wall_s",
        "value": t_mesh,
        "unit": f"s device time (shard_map + pallas engine, {L} lines, "
                f"{n_dev} chip)",
        "vs_baseline": t_single / t_mesh,  # 1.0 = zero mesh overhead
    }))
    return t_mesh, t_single


def bench_kernel(on_tpu: bool) -> float:
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.opacity import line_kernel_inputs
    from spectrobot_tpu.ops.pallas_opacity import accumulate_pallas
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    P = 16384 if on_tpu else 2048
    L = 20480 if on_tpu else 1024
    ll = random_lines(L, 600.0, 740.0, seed=0)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32, nu_ref=0.0)
    kl = line_kernel_inputs(dl, 220.0, 300.0, 100.0,
                            amp_weights=jnp.ones((2, dl.n_lines), jnp.float32))
    nu = jnp.asarray(np.linspace(640.0, 700.0, P), jnp.float32)

    # 256x256 is the best-measured dense configuration on v5e (round-4
    # sweep: 7.60 ms vs 8.20 ms at 256x512, 7.86 at 512x256; >=1024-wide
    # tiles exhaust VMEM).  The production WINDOWED paths keep
    # DEFAULT_BLOCK_L=128 — measured 1.6x faster there because finer
    # blocks let the static ragged windows skip more (256 blocks: fused
    # fwd 215 ms vs 132).
    run = lambda a: accumulate_pallas(nu, kl._replace(amps=a), tile_p=256,
                                      block_l=256, cutoff_cm1=None,
                                      interpret=not on_tpu)
    t0 = time.time()
    jax.block_until_ready(jax.jit(run)(kl.amps))
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    n_iter, n_rep = (20, 4) if on_tpu else (1, 1)
    dt = device_time(run, kl.amps, _perturb_flat, n_iter, n_rep)
    rate = P * L / dt
    print(f"time/call {dt * 1e3:.2f} ms (device time, {n_iter} chained, "
          f"min of {n_rep}), {P}x{L} dense pairs", file=sys.stderr)

    print(json.dumps({
        "metric": "voigt_opacity_dense_evals_per_s_per_chip",
        "value": rate,
        "unit": "(spectral-point x line)/s",
        "vs_baseline": rate / BASELINE,
    }))
    return rate


# Per-pair flop counts of the kernel's dispatch tiers, audited from the
# code (ops/pallas_opacity.py + ops/voigt.py), counting one transcendental
# (exp/sin/cos) as 8 flop-equivalents.  PRIMAL / GRAD (fused basis):
#   far   (_wr_region1 / _wrg_region1):       ~14 / ~30
#   mid   (region1+region2+select):           ~55 / ~80
#   near3 (w4 regions I-III):                ~165 / ~360
#   near4 (full w4 incl cexp):               ~300 / ~550
# (+4 pipeline ops per pair every tier pays: dnu, x, broadcast, mask.)
TIER_FLOPS = {"far": 14.0, "mid": 55.0, "near3": 165.0, "near4": 300.0}
TIER_FLOPS_GRAD = {"far": 30.0, "mid": 80.0, "near3": 360.0, "near4": 550.0}

# Theoretical v5e VPU f32 FMA bound, derived from the PUBLISHED 197
# TFLOP/s bf16 peak: 4 MXUs x 128x128 MACs x 2 flops -> ~1.5 GHz clock;
# ONE 8x128-lane FMA unit at that clock = 1.5e9 x 1024 x 2 ~= 3.1 TF f32.
# (The per-core VPU unit count is not public; a dual-issue VPU would
# double this — the bracket is stated wherever the bound is quoted.)
VPU_FMA_BOUND = 3.07e12


def _dense_tier_mix(nu_host, nuc_host, sx_min, y_min, tile_p, block_l,
                    sub_blocks):
    """Fraction of (tile x dispatch-slice) steps per tier for the DENSE
    kernel scenario (host-side replication of the kernel's gap bound)."""
    import numpy as np
    SBL = block_l // sub_blocks
    n_tiles = len(nu_host) // tile_p
    n_sl = len(nuc_host) // SBL
    t_lo = nu_host.reshape(n_tiles, tile_p).min(1)
    t_hi = nu_host.reshape(n_tiles, tile_p).max(1)
    s_lo = nuc_host.reshape(n_sl, SBL).min(1)
    s_hi = nuc_host.reshape(n_sl, SBL).max(1)
    gap = np.maximum(
        np.maximum(s_lo[None, :] - t_hi[:, None],
                   t_lo[:, None] - s_hi[None, :]), 0.0)
    s_min = gap * sx_min + y_min
    mix = {
        "far": float((s_min >= 15.0).mean()),
        "mid": float(((s_min >= 5.5) & (s_min < 15.0)).mean()),
    }
    near = (s_min < 5.5)
    if y_min >= 0.9:
        mix["near3"], mix["near4"] = float(near.mean()), 0.0
    else:
        mix["near3"], mix["near4"] = 0.0, float(near.mean())
    return mix


def bench_roofline(on_tpu: bool, kernel_rate: float) -> None:
    """Hardware-efficiency context for the headline kernel number
    (VERDICT r4 item 2): an EMPIRICAL VPU f32 FMA peak measured on this
    chip, the flop-audited achieved GFLOP/s of the dense kernel, and the
    percentage of peak.  '42x an arbitrary target' is not evidence of
    speed-of-light; 'X% of the measured VPU peak with a flop audit' is."""
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.opacity import line_kernel_inputs
    from spectrobot_tpu.ops.pallas_opacity import DEFAULT_SUB_BLOCKS
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    # 1. Empirical VPU peak: K-deep fused multiply-add chains on an f32
    #    array (XLA fuses each chain into one elementwise kernel; 2 flops
    #    per element per link).  The ceiling is the MAX over two chain
    #    depths and several repeats — single-depth single-run measurements
    #    varied ~15% between bench invocations, which would make the pct
    #    metric noise-dominated.
    N = (1 << 22) if on_tpu else (1 << 14)
    a = jnp.full((N,), 1.0000001, jnp.float32)
    b = jnp.full((N,), 1e-9, jnp.float32)

    def chain(K):
        def f(x):
            for _ in range(K):
                x = x * a + b
            return x
        return f

    n_iter, n_rep = (10, 5) if on_tpu else (1, 1)
    vpu_peak = 0.0
    for K in ((64, 256) if on_tpu else (8,)):
        dt = device_time(chain(K), jnp.ones((N,), jnp.float32),
                         _perturb_flat, n_iter, n_rep)
        vpu_peak = max(vpu_peak, 2.0 * K * N / dt)
    print(f"empirical VPU f32 FMA ceiling: {vpu_peak / 1e9:.0f} GFLOP/s "
          f"(max over 64/256-deep chains on {N} lanes, device time)",
          file=sys.stderr)

    # 2. Tier mix + weighted flops/pair for the SAME dense scenario
    #    bench_kernel measured.
    P, L = (16384, 20480) if on_tpu else (2048, 1024)
    ll = random_lines(L, 600.0, 740.0, seed=0)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32,
                                    nu_ref=0.0)
    kl = line_kernel_inputs(dl, 220.0, 300.0, 100.0)
    nu = np.linspace(640.0, 700.0, P).astype(np.float32)
    mix = _dense_tier_mix(nu, np.asarray(kl.nu_c, np.float32),
                          float(jnp.min(kl.scale_x)), float(jnp.min(kl.y)),
                          256, 256, DEFAULT_SUB_BLOCKS)
    # Two-regime analysis (round-5 measured; SURVEY.md section 14):
    # the DENSE benchmark is ~99% far tier at only ~18 flops/pair — per-
    # step machinery, not VPU flops, limits it — so its audit rate lands
    # near the plain-XLA elementwise rate.  The PRODUCTION fused-Jacobian
    # mix (~20% near tier at ~550 grad-flops/pair) is flops-dominated:
    # its audit rate is the honest hardware-efficiency number.
    flops_per_pair = 4.0 + sum(TIER_FLOPS[t] * f for t, f in mix.items())
    kernel_gflops = kernel_rate * flops_per_pair / 1e9
    pct = 100.0 * kernel_gflops * 1e9 / vpu_peak
    print(f"dense-kernel audit: {flops_per_pair:.0f} flops/pair "
          f"(mix far {mix['far']:.2f} mid {mix['mid']:.2f} "
          f"near3 {mix['near3']:.2f} near4 {mix['near4']:.2f}) -> "
          f"{kernel_gflops:.0f} GFLOP/s = {pct:.0f}% of the plain-XLA "
          f"elementwise rate (at this LOW intensity the kernel is "
          f"per-step-machinery-bound, not flops-bound — see the "
          f"production-mix metric below for the hardware-efficiency "
          f"number)", file=sys.stderr)
    print(json.dumps({
        "metric": "kernel_roofline_pct_of_vpu_peak",
        "value": pct,
        "unit": (f"% of the measured plain-XLA elementwise f32 mul-add "
                 f"rate ({vpu_peak / 1e9:.0f} GFLOP/s, same-chip chain, "
                 f"ILP-insensitive); DENSE far-tier audit "
                 f"{flops_per_pair:.0f} flops/pair (+-20% CSE slop) — "
                 f"machinery-bound regime; the production-mix TFLOP "
                 f"metric is the flops-bound one"),
        "vs_baseline": pct / 100.0,
    }))


def bench_production_roofline(on_tpu: bool, t_jac: float) -> None:
    """Hardware-efficiency of the PRODUCTION fused-Jacobian pass: exact
    evaluated-pair count and dispatch-tier mix of the bench_fused_pallas
    scenario computed host-side (window tables + geometry-derived active
    states), grad-tier flop audit, divided by the MEASURED total Jacobian
    device time.  This is a conservative LOWER BOUND on the Voigt stage's
    rate (the same measured time also contains the MXU contractions, DMA/
    grid machinery, and the RT/ILS tangent epilogue — the round-5 ablation
    isolated the Voigt stage at ~2.3-2.4 TFLOP(audit)/s, ~77% of the
    one-FMA-unit theoretical bound; SURVEY.md section 14)."""
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.ops.opacity import line_kernel_inputs
    from spectrobot_tpu.ops.pallas_opacity import (
        DEFAULT_BLOCK_L, DEFAULT_SUB_BLOCKS, DEFAULT_TILE_P, _block_windows)
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    P, n_lev, n_rays, L = (8192, 32, 20, 2048) if on_tpu else (512, 6, 2, 256)
    ll = random_lines(L, 600.0, 750.0, seed=3)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32)
    atm = mars_standard_atmosphere(n_lev=n_lev, z_top=80e3)
    nu_off = np.asarray(np.linspace(600.0, 750.0, P) - float(dl.nu_ref),
                        np.float32)
    ths = jnp.asarray(np.linspace(5e3, 70e3, n_rays), jnp.float32)
    cg = limb_path_cg(atm, ["CO2"], ths, MARS, 4)
    act_lay = (np.asarray(cg.u).sum(-1) > 0)          # [R, NL]
    z = np.asarray(atm.z)
    zmid = 0.5 * (z[1:] + z[:-1])
    Tl = np.interp(zmid, z, np.asarray(atm.T))
    plm = np.exp(np.interp(zmid, z, np.log(np.asarray(atm.p))))
    nuc = np.asarray(dl.nu0, np.float32)
    TP, BL, SB = DEFAULT_TILE_P, DEFAULT_BLOCK_L, DEFAULT_SUB_BLOCKS
    SBL = BL // SB
    Pp = -(-P // TP) * TP
    Lp = -(-L // BL) * BL
    nup = np.full(Pp, nu_off.max() + 1e6, np.float32)
    nup[:P] = nu_off
    nucp = np.full(Lp, nuc.max() + 1e7, np.float32)
    nucp[:L] = nuc
    st, ct = _block_windows(nup, nucp, TP, BL, 26.0)
    n_tiles = Pp // TP
    t_lo = nup.reshape(n_tiles, TP).min(1)
    t_hi = nup.reshape(n_tiles, TP).max(1)
    n_sl = Lp // SBL
    s_lo = nucp.reshape(n_sl, SBL).min(1)
    s_hi = nucp.reshape(n_sl, SBL).max(1)
    flops = 0.0
    pairs = 0.0
    for li in range(n_lev - 1):
        kl = line_kernel_inputs(dl, jnp.asarray(Tl[li]),
                                jnp.asarray(plm[li]))
        sx_min = float(jnp.min(kl.scale_x))
        y_min = float(jnp.min(kl.y))
        w = int(act_lay[:, li].sum())                 # active rays w/ layer
        if not w:
            continue
        for i in range(n_tiles):
            for b in range(st[i], st[i] + ct[i]):
                for s in range(b * SB, (b + 1) * SB):
                    gap = max(max(s_lo[s] - t_hi[i], t_lo[i] - s_hi[s]),
                              0.0)
                    smin = gap * sx_min + y_min
                    tier = ("far" if smin >= 15.0 else
                            "mid" if smin >= 5.5 else
                            "near3" if y_min >= 0.9 else "near4")
                    flops += w * (TIER_FLOPS_GRAD[tier] + 4.0) * TP * SBL
                    pairs += w * TP * SBL
    tflops = flops / t_jac / 1e12
    pct_bound = 100.0 * flops / t_jac / VPU_FMA_BOUND
    print(f"production-mix roofline: {pairs / 1e9:.2f} G pairs/jac pass, "
          f"{flops / 1e9:.0f} audit GFLOP -> >= {tflops:.2f} TFLOP/s over "
          f"the WHOLE measured Jacobian pass = >= {pct_bound:.0f}% of the "
          f"one-FMA-unit theoretical bound ({VPU_FMA_BOUND / 1e12:.1f} TF; "
          f"the Voigt stage alone, ablation-isolated, runs ~2x this "
          f"lower bound)", file=sys.stderr)
    print(json.dumps({
        "metric": "fused_jacobian_audit_tflops_lower_bound",
        "value": tflops,
        "unit": (f"audit TFLOP/s over the TOTAL measured fused-Jacobian "
                 f"device time (grad-tier flop audit +-20%; conservative "
                 f"— the same time also pays MXU/DMA/epilogue; "
                 f">= {pct_bound:.0f}% of the ~{VPU_FMA_BOUND / 1e12:.1f} "
                 f"TF one-FMA-unit theoretical v5e VPU bound)"),
        "vs_baseline": flops / t_jac / VPU_FMA_BOUND,
    }))


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    on_tpu = dev.platform == "tpu"
    bench_limb_scan(on_tpu)
    _, t_jac = bench_fused_pallas(on_tpu)
    bench_sharded_pallas(on_tpu)
    rate = bench_kernel(on_tpu)
    bench_roofline(on_tpu, rate)
    bench_production_roofline(on_tpu, t_jac)
    bench_kernel(on_tpu)  # headline metric LAST — the driver's primary capture


if __name__ == "__main__":
    main()
