"""Forward-model entry points (layer L3, SURVEY.md section 2.2).

``nadir_single_layer`` is the minimum end-to-end slice (SURVEY.md 8.2,
BASELINE.json config 1): parser -> S(T) -> Voigt -> k(nu) -> single-layer RT.
The full limb/nadir multi-layer models live in :mod:`spectrobot_tpu.forward.limb`.
Everything here is jit-able and differentiable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from spectrobot_tpu.ops import opacity
from spectrobot_tpu.ops.planck import planck_nu
from spectrobot_tpu.ops.strengths import DeviceLines


def nadir_single_layer(
    nu_grid: jnp.ndarray,
    lines: DeviceLines,
    T_layer,
    p_layer_pa,
    column_m2,
    vmr_self,
    T_surface,
    *,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
    chunk: int = 256,
) -> jnp.ndarray:
    """Radiance of one homogeneous layer over a blackbody surface (config 1).

    I(nu) = B_nu(T_surf) * exp(-tau) + B_nu(T_layer) * (1 - exp(-tau)),
    tau = sigma(nu) * u,  u = column of the absorber [molec m^-2].

    Args:
      nu_grid: [P] wavenumber grid [cm-1].
      T_layer, p_layer_pa: layer temperature [K] and pressure [Pa].
      column_m2: absorber column density [molec m^-2] (converted to cm^-2
        internally per the constants.py unit contract).
      vmr_self: absorber volume mixing ratio (for self-broadening).
      T_surface: surface blackbody temperature [K].
    """
    sigma_abs, _ = opacity.cross_sections(
        nu_grid, lines, T_layer, p_layer_pa, p_self_pa=vmr_self * p_layer_pa,
        variant=variant, cutoff_cm1=cutoff_cm1, chunk=chunk,
    )
    u_cm2 = column_m2 * 1.0e-4
    tau = sigma_abs * u_cm2
    t = jnp.exp(-tau)
    return planck_nu(nu_grid, T_surface) * t + planck_nu(nu_grid, T_layer) * (1.0 - t)
