"""AOT scheduling evidence for the nu-halo tier decision (VERDICT r3 item 1).

Compiles the PRODUCTION ``engine='pallas' + nu_halo`` shard_map body
(parallel/sharded.py) against a virtual 8-chip v5e topology
(``jax.experimental.topologies`` — no hardware needed) and inspects the
optimized HLO schedule to answer the one question the ppermute-vs-DMA
decision hinges on: does XLA actually OVERLAP the ring permutes of
neighbour line parameters with independent local compute, or does it
serialize them?

Writes ``benchmarks/HALO_OVERLAP.json`` with:

* the count and schedule positions of ``collective-permute-start`` /
  ``-done`` pairs,
* the number of independent fusions XLA packed between the first start
  and the first done (the latency-hiding window),
* the byte traffic of the production tier vs the fused remote-DMA tier
  (benchmarks/dma_halo.py) at config-2 scale — the quantitative argument
  recorded in parallel/sharded.py's module docstring.

Run: ``python benchmarks/halo_overlap_aot.py`` (CPU is fine; the compile
targets the TPU topology, nothing executes).
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def compile_nu_halo_hlo(topology: str = "v5e:2x4") -> str:
    """AOT-compile the production nu-halo forward for ``topology`` and
    return the optimized HLO text."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import __graft_entry__ as ge
    from spectrobot_tpu.data.atmosphere import MARS
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.parallel.sharded import (
        partition_lines_by_nu, sharded_radiance_fn)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devs = np.array(topo.devices)
    mesh = Mesh(devs.reshape(2, 2, 2), ("ray", "line", "nu"))

    atm, dl, nu, h_t = ge._scene(n_nu=512)
    cg = limb_path_cg(atm, ["CO2", "CO"], h_t, MARS, n_sub=2)
    lines_h = partition_lines_by_nu(dl, np.asarray(nu, np.float64), 2,
                                    cutoff_cm1=20.0, line_shards=2)
    nu_off = nu - dl.nu_ref.astype(nu.dtype)

    fn = sharded_radiance_fn(
        mesh, has_nlte=False, has_background=False, cutoff_cm1=20.0,
        chunk=128, engine="pallas", nu_halo=True,
        win_grid=np.asarray(nu_off, np.float64),
        win_lines=np.asarray(lines_h.nu0, np.float64))

    def call(nu_g, lns, u, T_sp, p_sp, ps_sp, T_air, u_air, uu_air, seg):
        cg2 = cg._replace(u=u, T_sp=T_sp, p_sp=p_sp, p_self_sp=ps_sp,
                          T_air=T_air, u_air=u_air, uu_air=uu_air,
                          seg_layer=seg)
        return fn(nu_g, lns, cg2)

    lowered = jax.jit(call).lower(
        nu, lines_h, cg.u, cg.T_sp, cg.p_sp, cg.p_self_sp, cg.T_air,
        cg.u_air, cg.uu_air, cg.seg_layer)
    return lowered.compile().as_text()


def analyze(hlo: str) -> dict:
    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines)
              if "collective-permute-start" in l and "= (" in l]
    dones = [i for i, l in enumerate(lines)
             if re.search(r"= \S+ collective-permute-done", l)]
    kernels = [i for i, l in enumerate(lines) if "tpu_custom_call" in l]
    window = lines[min(starts) + 1:min(dones)] if starts and dones else []
    fusions_in_window = sum(1 for l in window if " fusion(" in l)
    return {
        "n_permute_starts": len(starts),
        "n_permute_dones": len(dones),
        "first_start_line": min(starts) if starts else None,
        "first_done_line": min(dones) if dones else None,
        "fusions_overlapped_in_flight_window": fusions_in_window,
        "pallas_kernel_call_lines": kernels,
        "async_pairs_emitted": bool(starts and dones),
    }


def traffic_argument(R_loc=10, NL=20, n_out=2, n_fields=11) -> dict:
    """Bytes moved per halo hop, per shard, per Lmax line slot (f32).

    Production (ppermute of raw DeviceLines fields): the body re-derives
    per-(ray, layer) kernel inputs locally, so only the ``n_fields`` raw
    per-line arrays cross the ring.  Fused remote-DMA tier
    (benchmarks/dma_halo.py): the kernel consumes PRE-COMPUTED inputs
    (nu_c, scale_x, y, amps) which are per-(ray, layer) because widths and
    pressure shifts depend on layer T/p — the payload multiplies by the
    local batch B = R_loc * NL.
    """
    ppermute_per_line = n_fields * 4
    dma_per_line = (3 + n_out) * R_loc * NL * 4
    return {
        "ppermute_bytes_per_line_slot": ppermute_per_line,
        "fused_dma_bytes_per_line_slot": dma_per_line,
        "dma_over_ppermute_ratio": dma_per_line / ppermute_per_line,
        "assumptions": {"R_loc": R_loc, "NL": NL, "n_out": n_out,
                        "raw_fields": n_fields},
    }


def main():
    hlo = compile_nu_halo_hlo()
    out = {
        "topology": "v5e:2x4 (virtual, AOT)",
        "schedule": analyze(hlo),
        "traffic_config2_scale": traffic_argument(),
        "decision": ("ppermute tier retained as the ONLY production halo: "
                     "XLA emits async start/done permute pairs and packs "
                     "independent prologue fusions into the in-flight "
                     "window; the fused remote-DMA tier would move ~91x "
                     "more bytes (per-(ray,layer) kernel inputs) and lose "
                     "static ragged windows."),
    }
    path = REPO / "benchmarks" / "HALO_OVERLAP.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["schedule"], indent=2))
    print("traffic ratio (dma/ppermute):",
          out["traffic_config2_scale"]["dma_over_ppermute_ratio"])
    print("wrote", path)


if __name__ == "__main__":
    main()
