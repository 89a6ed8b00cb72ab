"""(P, T) opacity look-up tables (component C9, SURVEY.md).

The reference (fedef17/SpectRobot ``makeLUT*`` [SURVEY.md 1.2/4.3]) precomputes
absorption/emission coefficients per species/level on a (P, T) grid with a
multiprocessing pool, then interpolates at runtime.  TPU-native position
(SURVEY.md C9): on TPU, recomputing the line sum is often FASTER than
streaming a big LUT from HBM, so the LUT is a CACHE TIER, not the core path —
useful for very large line lists on small grids, for CPU fallbacks, and for
serving scenarios that amortise a build across many retrievals.

Design: one dense table ``sigma[S, nT, nQ, P]`` of absorption cross sections
on a (T, log10 p) lattice, built by the SAME stage-1/2 machinery as the
direct path (so LUT and direct agree to interpolation error by construction),
interpolated bilinearly in (T, log p) — fully differentiable, so retrieval
Jacobians flow through the table.

Limitations (documented): LTE only (non-LTE weights are per-line and
T_vib-dependent — the direct path handles them exactly); self-broadening is
frozen at a per-species VMR chosen at build time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.ops.opacity import cross_sections
from spectrobot_tpu.ops.strengths import DeviceLines


class OpacityLUT(NamedTuple):
    nu_grid: jnp.ndarray     # [P]
    T_grid: jnp.ndarray      # [nT] (uniform)
    logp_grid: jnp.ndarray   # [nQ] log10(p/Pa) (uniform)
    sigma: jnp.ndarray       # [S, nT, nQ, P] cm^2/molec
    vmr_self: jnp.ndarray    # [S] self-broadening VMR frozen at build


def build_lut(
    nu_grid: jnp.ndarray,
    lines: DeviceLines,
    n_species: int,
    T_min: float = 120.0, T_max: float = 320.0, n_T: int = 21,
    p_min: float = 1e-3, p_max: float = 2e3, n_p: int = 25,
    vmr_self: Optional[Sequence[float]] = None,
    *,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
    chunk: int = 256,
) -> OpacityLUT:
    """Build the table with the direct line-sum machinery (jit-batched over
    the (T, p) lattice; species separated by masking amplitudes)."""
    S = n_species
    vs = np.ones(S) if vmr_self is None else np.asarray(vmr_self, dtype=float)
    T_grid = jnp.linspace(T_min, T_max, n_T)
    logp_grid = jnp.linspace(np.log10(p_min), np.log10(p_max), n_p)
    dt = nu_grid.dtype

    def one_point(T, logp):
        p = 10.0 ** logp
        outs = []
        for s in range(S):
            mask = (lines.species_idx == s).astype(dt)
            sa, _ = cross_sections(
                nu_grid, lines, T, p, p_self_pa=float(vs[s]) * p,
                w_abs=mask, w_em=mask, chunk=chunk, variant=variant,
                cutoff_cm1=cutoff_cm1, analytic_jvp=False)
            outs.append(sa)
        return jnp.stack(outs)                    # [S, P]

    # The reference builds its LUT with a multiprocessing pool (SURVEY.md
    # 4.3); here the pressure column is one on-device vmap batch per T row
    # (bounded memory: nQ x S x P per step).
    one_row = jax.jit(jax.vmap(one_point, in_axes=(None, 0), out_axes=1))
    rows = [one_row(T_grid[ti], logp_grid) for ti in range(n_T)]
    sigma = jnp.stack(rows, axis=1)               # [S, nT, nQ, P]
    return OpacityLUT(nu_grid=nu_grid, T_grid=T_grid, logp_grid=logp_grid,
                      sigma=sigma, vmr_self=jnp.asarray(vs, dt))


def interp_sigma(lut: OpacityLUT, T, p_pa) -> jnp.ndarray:
    """Bilinear interpolation in (T, log10 p) -> sigma [S, P].
    Differentiable; clamps to the table boundary."""
    nT = lut.T_grid.shape[0]
    nQ = lut.logp_grid.shape[0]
    ft = (T - lut.T_grid[0]) / (lut.T_grid[1] - lut.T_grid[0])
    fq = (jnp.log10(p_pa) - lut.logp_grid[0]) / (lut.logp_grid[1] - lut.logp_grid[0])
    ft = jnp.clip(ft, 0.0, nT - 1.000001)
    fq = jnp.clip(fq, 0.0, nQ - 1.000001)
    it = jnp.floor(ft).astype(jnp.int32)
    iq = jnp.floor(fq).astype(jnp.int32)
    at = ft - it
    aq = fq - iq
    s00 = lut.sigma[:, it, iq]
    s01 = lut.sigma[:, it, iq + 1]
    s10 = lut.sigma[:, it + 1, iq]
    s11 = lut.sigma[:, it + 1, iq + 1]
    return ((1 - at) * (1 - aq) * s00 + (1 - at) * aq * s01
            + at * (1 - aq) * s10 + at * aq * s11)


def layer_tau_lut(lut: OpacityLUT, cg) -> jnp.ndarray:
    """LTE per-(ray, layer) optical depth from the LUT: dtau [R, NL, P].
    (dtau_em == dtau in LTE.)  Uses per-species CG states."""

    def one(u_sp, T_sp, p_sp):
        sig = jax.vmap(lambda s, T, p: interp_sigma(lut, T, p)[s],
                       in_axes=(0, 0, 0))(jnp.arange(u_sp.shape[0]), T_sp, p_sp)
        return jnp.sum(sig * (u_sp[:, None] * 1.0e-4), axis=0)   # [P]

    per_layer = jax.vmap(one)
    per_ray = jax.vmap(per_layer)
    return per_ray(cg.u, cg.T_sp, cg.p_sp)


def save_lut(lut: OpacityLUT, path: str) -> None:
    np.savez_compressed(path, nu_grid=np.asarray(lut.nu_grid),
                        T_grid=np.asarray(lut.T_grid),
                        logp_grid=np.asarray(lut.logp_grid),
                        sigma=np.asarray(lut.sigma),
                        vmr_self=np.asarray(lut.vmr_self))


def load_lut(path: str) -> OpacityLUT:
    with np.load(path) as z:
        return OpacityLUT(nu_grid=jnp.asarray(z["nu_grid"]),
                          T_grid=jnp.asarray(z["T_grid"]),
                          logp_grid=jnp.asarray(z["logp_grid"]),
                          sigma=jnp.asarray(z["sigma"]),
                          vmr_self=jnp.asarray(z["vmr_self"]))
