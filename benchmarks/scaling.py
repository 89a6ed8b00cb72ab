#!/usr/bin/env python
"""Scaling-efficiency benchmark (BASELINE.json:5: ">= 80% grid-points/s
scaling efficiency at 1 chip, 1 host, and >= 2 hosts on a Mars CO2 limb
retrieval").

Runs the SAME Mars CO2 limb forward over growing nu-meshes with the
per-device grid chunk FIXED (weak scaling: global grid grows with devices),
and reports grid-points/s and efficiency vs the single-device rate.

On this image only one TPU chip is reachable, so the default run emulates
devices on CPU (--platform cpu --devices 8) to validate the harness and the
collective paths; on a real slice, run WITHOUT --platform to use every chip,
and across hosts launch one process per host after
``parallel.mesh.initialize_multihost()``.

Usage:
    python benchmarks/scaling.py [--devices 8] [--platform cpu]
        [--points-per-device 2048] [--lines 2000] [--rays 8]
Outputs one JSON line per mesh size on stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="emulated device count (0 = use real devices)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force platform (cpu enables device emulation)")
    ap.add_argument("--points-per-device", type=int, default=2048)
    ap.add_argument("--lines", type=int, default=2000)
    ap.add_argument("--rays", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--halo", action="store_true",
                    help="use the production nu-halo tier (owner-shard "
                         "lines + ring ppermute) instead of the line psum")
    ap.add_argument("--json-out", default=None,
                    help="also write all records to this JSON file "
                         "(tracked artifact: benchmarks/SCALING.json)")
    args = ap.parse_args()
    records = []

    if args.devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band, random_lines
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.parallel.mesh import make_mesh
    from spectrobot_tpu.parallel.sharded import (
        pad_lines_for_mesh, sharded_radiance_fn, stage_sharded,
    )

    devices = jax.devices()
    n_max = len(devices)
    dtype = jnp.float32 if devices[0].platform == "tpu" else jnp.float64

    atm = mars_standard_atmosphere(n_lev=21, z_top=90e3)
    atm = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype") and
        a.dtype in (jnp.float32, jnp.float64) else a, atm)
    ll = co2_15um_band(j_max=40).concat(
        random_lines(args.lines, 560.0, 780.0, seed=2))
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=dtype)
    h_t = jnp.asarray(np.linspace(6e3, 80e3, args.rays), dtype)
    cg = limb_path_cg(atm, ["CO2"], h_t, MARS, n_sub=2)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / args.reps

    # --- Sharded-path overhead on the DEGENERATE 1-device mesh -----------
    # Measurable even with one chip (VERDICT.md round-1 weak item 3): the
    # 1-device mesh still executes the full shard_map program — line psum,
    # halo plumbing, sharded layouts — so (t_mesh / t_plain - 1) bounds the
    # framework-side collective overhead, separating it from real ICI time
    # once multi-chip hardware is available.
    from spectrobot_tpu.forward.limb import limb_radiance
    P1 = args.points_per_device
    nu1_host = np.linspace(600.0, 740.0, P1)
    nu1 = jnp.asarray(nu1_host, dtype)
    nu1_off = jnp.asarray(nu1_host - float(dl.nu_ref), dtype)
    plain = jax.jit(lambda: limb_radiance(nu1, dl, cg, chunk=256,
                                          nu_off=nu1_off))
    t_plain = timeit(plain)
    mesh1 = make_mesh((1, 1, 1), devices[:1])
    f1 = sharded_radiance_fn(mesh1, has_nlte=False, has_background=False,
                             chunk=256)
    nu_s1, lines_s1, cg_s1, _, _ = stage_sharded(mesh1, nu1, dl, cg)
    t_mesh1 = timeit(lambda: f1(nu_s1, lines_s1, cg_s1, nu_off=nu1_off))
    rec = {
        "metric": "sharded_overhead_1dev",
        "t_plain_s": round(t_plain, 4), "t_mesh_s": round(t_mesh1, 4),
        "overhead_frac": round(t_mesh1 / t_plain - 1.0, 4),
    }
    records.append(rec)
    print(json.dumps(rec))
    sys.stdout.flush()

    sizes = []
    n = 1
    while n <= n_max:
        sizes.append(n)
        n *= 2

    base_rate = None
    for n in sizes:
        P = args.points_per_device * n          # weak scaling
        nu_host = np.linspace(600.0, 740.0, P)
        nu = jnp.asarray(nu_host, dtype)
        mesh = make_mesh((1, 1, n), devices[:n])
        if args.halo:
            # Production nu-halo tier (owner-shard lines + ring ppermute);
            # cutoff must fit the shard width: 140/n cm^-1 chunks.
            from spectrobot_tpu.parallel.sharded import partition_lines_by_nu
            cutoff = min(10.0, 0.9 * 140.0 / n)
            dlp = partition_lines_by_nu(dl, nu_host, n, cutoff_cm1=cutoff)
            f = sharded_radiance_fn(mesh, has_nlte=False,
                                    has_background=False, chunk=256,
                                    cutoff_cm1=cutoff, nu_halo=True)
            nu_s, lines_s, cg_s, _, _ = stage_sharded(mesh, nu, dlp, cg)
        else:
            f = sharded_radiance_fn(mesh, has_nlte=False,
                                    has_background=False, chunk=256)
            nu_s, lines_s, cg_s, _, _ = stage_sharded(mesh, nu, dl, cg)
        out = f(nu_s, lines_s, cg_s)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(args.reps):
            out = f(nu_s, lines_s, cg_s)
        out.block_until_ready()
        dt = (time.time() - t0) / args.reps
        rate = P * args.rays / dt               # ray-grid-points per second
        if base_rate is None:
            base_rate = rate / n                # per-device baseline
        eff = rate / (base_rate * n)
        rec = {
            "n_devices": n, "grid_points": P,
            "halo": bool(args.halo),
            "wall_s": round(dt, 4),
            "grid_points_per_s": rate,
            "efficiency_vs_1dev": round(eff, 4),
        }
        records.append(rec)
        print(json.dumps(rec))
        sys.stdout.flush()

    if args.json_out:
        n_cores = os.cpu_count()
        label = ("harness-validation (emulated CPU devices time-sharing "
                 f"{n_cores} physical cores — validates the weak-scaling "
                 "path end-to-end; efficiency ~cores/devices is EXPECTED "
                 "here and says nothing about the >=80% ICI claim, which "
                 "needs >1 real chip)" if devices[0].platform != "tpu"
                 else f"{n_max}-chip {devices[0].device_kind}")
        with open(args.json_out, "w") as fh:
            json.dump({"label": label, "platform": devices[0].platform,
                       "n_devices_max": n_max, "host_cores": n_cores,
                       "points_per_device": args.points_per_device,
                       "n_lines": int(dl.n_lines), "n_rays": args.rays,
                       "records": records}, fh, indent=2)
            fh.write("\n")
        print(f"wrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
