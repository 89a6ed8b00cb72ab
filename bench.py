#!/usr/bin/env python
"""Headline benchmark: Pallas opacity-kernel throughput on one chip.

Metric (BASELINE.json:2): (spectral-point x line) evaluations per second per
chip, dense evaluation (every pair evaluated — the honest denominator), on
the fused Voigt+accumulation Pallas kernel (ops/pallas_opacity.py).
Baseline: the project target >= 1e9 evals/s/chip (BASELINE.md; the reference
publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
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


def main() -> None:
    from spectrobot_tpu.data.synth import random_lines
    from spectrobot_tpu.ops.opacity import line_kernel_inputs
    from spectrobot_tpu.ops.pallas_opacity import accumulate_pallas
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    on_tpu = dev.platform == "tpu"

    P = 16384 if on_tpu else 2048
    L = 20480 if on_tpu else 1024
    ll = random_lines(L, 600.0, 740.0, seed=0)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float32, nu_ref=0.0)
    kl = line_kernel_inputs(dl, 220.0, 300.0, 100.0,
                            amp_weights=jnp.ones((2, dl.n_lines), jnp.float32))
    nu = jnp.asarray(np.linspace(640.0, 700.0, P), jnp.float32)

    # 256x512 is the best-measured dense configuration on v5e (the MXU
    # reduction amortises better over 512-line blocks).
    run = lambda: accumulate_pallas(nu, kl, tile_p=256, block_l=512,
                                    cutoff_cm1=None, interpret=not on_tpu)
    t0 = time.time()
    run().block_until_ready()
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    # Median-of-batches against tunnel timing variance.
    n_rep, n_batch = (5, 5) if on_tpu else (1, 1)
    times = []
    for _ in range(n_batch):
        t0 = time.time()
        for _ in range(n_rep):
            out = run()
        out.block_until_ready()
        times.append((time.time() - t0) / n_rep)
    dt = sorted(times)[len(times) // 2]
    rate = P * L / dt
    print(f"time/call {dt * 1e3:.2f} ms (median of {n_batch}), "
          f"{P}x{L} dense pairs", file=sys.stderr)

    print(json.dumps({
        "metric": "voigt_opacity_dense_evals_per_s_per_chip",
        "value": rate,
        "unit": "(spectral-point x line)/s",
        "vs_baseline": rate / BASELINE,
    }))


if __name__ == "__main__":
    main()
