#!/usr/bin/env python
"""A/B harness for the fused-basis (Jacobian) kernel experiments.

Times ONLY the bench.py fused-engine scenario (fwd + 32-column fused-basis
Jacobian at 2048 lines) with the chained-dispatch device-time method, and
prints one JSON line.  Variants are selected via env vars READ AT IMPORT by
ops/pallas_opacity.py, so each configuration must run in a FRESH process:

    SPECTROBOT_MM_PRECISION=highest|high|default
    SPECTROBOT_MERGED_DOT=0|1
    SPECTROBOT_Y4_MIN=0.9 (production) | 1e30 (disable region-IV elision)

Usage: python benchmarks/jac_kernel_bench.py [label]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "unlabeled"
    from bench import bench_fused_pallas
    on_tpu = jax.devices()[0].platform == "tpu"
    t_fwd, t_jac = bench_fused_pallas(on_tpu)
    print(json.dumps({
        "label": label,
        "mm_precision": os.environ.get("SPECTROBOT_MM_PRECISION", "highest"),
        "merged_dot": os.environ.get("SPECTROBOT_MERGED_DOT", "0"),
        "y4_min": os.environ.get("SPECTROBOT_Y4_MIN", "0.9"),
        "fwd_ms": t_fwd * 1e3,
        "jac_ms": t_jac * 1e3,
        "total_ms": (t_fwd + t_jac) * 1e3,
    }))


if __name__ == "__main__":
    main()
