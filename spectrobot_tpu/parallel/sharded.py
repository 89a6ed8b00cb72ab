"""Sharded forward model over the (ray, line, nu) mesh (C21-C23, C26).

Decomposition (SURVEY.md section 2.2 L4, BASELINE.json:5 "domain-decomposing
the wavenumber grid and line list per chip"):

* ``nu``   — each chip owns a contiguous chunk of the fine wavenumber grid.
* ``line`` — each chip owns a slice of the (nu0-sorted) line list and
  accumulates PARTIAL (dtau, dtau_em) on its local grid chunk; one
  ``lax.psum`` over the ``line`` axis completes the sums.  The psum happens
  BEFORE the nonlinear source assembly, which keeps line-sharding exact
  (see forward.limb.layer_tau).
* ``ray``  — tangent heights are pure data parallelism.

Communication pattern per forward step: exactly one psum (over 'line'); the
RT integration is local to each (ray, nu) chunk.  Wavenumber-neighbour halo
traffic only exists inside the distributed Pallas kernel variant
(parallel/halo.py) — in this XLA-collective path, line wings crossing a nu
boundary are handled by every line shard evaluating against its LOCAL grid
chunk with the same |dnu| <= cutoff mask, which is mathematically identical
to a halo exchange of wing contributions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrobot_tpu.data.nlte import DeviceNLTE
from spectrobot_tpu.forward.geometry import PathCG
from spectrobot_tpu.forward.limb import layer_tau, optics_from_tau, path_radiance
from spectrobot_tpu.ops.strengths import DeviceLines

# PartitionSpecs for the pytrees crossing the shard_map boundary.
LINES_SPECS = DeviceLines(
    nu0=P("line"), sw=P("line"), elower=P("line"), gamma_air=P("line"),
    gamma_self=P("line"), n_air=P("line"), delta_air=P("line"),
    mass_amu=P("line"), species_idx=P("line"), level_upper=P("line"),
    level_lower=P("line"), q_tbl=P(), q_tgrid=P(), nu_ref=P(),
)
NLTE_SPECS = DeviceNLTE(e_level=P(), t_vib=P())


def sharded_radiance_fn(
    mesh: Mesh,
    has_nlte: bool,
    has_background: bool,
    *,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
    chunk: int = 256,
):
    """Build the jitted shard_map radiance function for a mesh.

    Returns f(nu_grid, lines, cg, nlte, I_bg) -> I [R, P] with
    R % mesh['ray'] == 0, P % mesh['nu'] == 0, L % mesh['line'] == 0.
    ``nlte`` / ``I_bg`` must be None iff has_nlte/has_background are False.
    PathCG's static fields don't cross the shard_map boundary — only its
    arrays do (flat), and the struct is rebuilt locally.
    """

    def body(nu_loc, nu_off_loc, lines_loc, u, T_sp, p_sp, ps_sp, T_air,
             seg_layer, nlte_loc, bg_loc):
        cg_loc = PathCG(u=u, T_sp=T_sp, p_sp=p_sp, p_self_sp=ps_sp,
                        T_air=T_air, seg_layer=seg_layer,
                        seg_count=int(seg_layer.shape[0]), is_limb=True)
        dtau, dtau_em = layer_tau(
            nu_loc, lines_loc, cg_loc, nlte_loc,
            variant=variant, cutoff_cm1=cutoff_cm1, chunk=chunk,
            nu_off=nu_off_loc)
        # C23: complete the line sums across the line axis (single psum).
        dtau, dtau_em = lax.psum((dtau, dtau_em), "line")
        optics = optics_from_tau(nu_loc, cg_loc, dtau, dtau_em)
        return path_radiance(optics, cg_loc, bg_loc)

    in_specs = (
        P("nu"), P("nu"),
        LINES_SPECS,
        P("ray"), P("ray"), P("ray"), P("ray"), P("ray"), P(),
        NLTE_SPECS if has_nlte else None,
        P("nu") if has_background else None,
    )
    out_specs = P("ray", "nu")

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    jitted = jax.jit(fn)

    def apply(nu_grid, lines, cg: PathCG, nlte=None, I_bg=None, nu_off=None):
        if nu_off is None:
            # f64 grids lose nothing here; f32 callers should stage nu_off
            # from float64 (see DeviceLines docstring).
            nu_off = nu_grid - lines.nu_ref.astype(nu_grid.dtype)
        return jitted(nu_grid, nu_off, lines, cg.u, cg.T_sp, cg.p_sp,
                      cg.p_self_sp, cg.T_air, cg.seg_layer, nlte, I_bg)

    return apply


def stage_sharded(mesh: Mesh, nu_grid, lines: DeviceLines, cg: PathCG,
                  nlte: Optional[DeviceNLTE] = None,
                  I_bg: Optional[jnp.ndarray] = None):
    """device_put every input with its mesh sharding (explicit layout — the
    collectives then ride ICI without any resharding)."""
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    nu_s = put(nu_grid, P("nu"))
    lines_s = DeviceLines(*[
        put(getattr(lines, f), getattr(LINES_SPECS, f))
        for f in DeviceLines._fields
    ])
    cg_s = PathCG(
        u=put(cg.u, P("ray")), T_sp=put(cg.T_sp, P("ray")),
        p_sp=put(cg.p_sp, P("ray")), p_self_sp=put(cg.p_self_sp, P("ray")),
        T_air=put(cg.T_air, P("ray")), seg_layer=put(cg.seg_layer, P()),
        seg_count=cg.seg_count, is_limb=cg.is_limb,
    )
    nlte_s = None if nlte is None else DeviceNLTE(
        e_level=put(nlte.e_level, P()), t_vib=put(nlte.t_vib, P()))
    bg_s = None if I_bg is None else put(I_bg, P("nu"))
    return nu_s, lines_s, cg_s, nlte_s, bg_s


def pad_lines_for_mesh(lines: DeviceLines, n_shards: int) -> DeviceLines:
    """Pad the line axis to a multiple of the line-mesh size with zero-
    strength lines (harmless under the linear accumulation contract)."""
    L = lines.n_lines
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    pad = Lp - L
    if pad == 0:
        return lines
    def padf(a, fill):
        return jnp.pad(a, (0, pad), constant_values=fill)
    return lines._replace(
        nu0=padf(lines.nu0, 0.0), sw=padf(lines.sw, 0.0),
        elower=padf(lines.elower, 0.0), gamma_air=padf(lines.gamma_air, 1e-3),
        gamma_self=padf(lines.gamma_self, 1e-3), n_air=padf(lines.n_air, 0.5),
        delta_air=padf(lines.delta_air, 0.0),
        mass_amu=padf(lines.mass_amu, 40.0),
        species_idx=padf(lines.species_idx, 0),
        level_upper=padf(lines.level_upper, -1),
        level_lower=padf(lines.level_lower, -1),
    )
