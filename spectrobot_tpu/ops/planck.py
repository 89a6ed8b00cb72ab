"""Planck function and non-LTE source weights (components C8, SURVEY.md).

Non-LTE design (SURVEY.md C7/C8): line-by-line population ratios
``r_u = n_u / n_u^LTE`` and ``r_l = n_l / n_l^LTE`` enter the opacity sum as
two per-line scalar weights,

    w_abs_i = (r_l - r_u E_i) / (1 - E_i),      E_i = exp(-c2 nu0_i / T)
    w_em_i  = r_u,

so that the layer absorption coefficient is k_abs = sum_i S_i V_i w_abs_i and
the layer emission coefficient is j = B_nu(T) * sum_i S_i V_i w_em_i (the
identity j_i = k_i * S_i = k0_i B r_u makes the emission weight exactly r_u).
The layer source function is then S_nu = B_nu(T) * k_em / k_abs.  In LTE
(r_u = r_l = 1) both weights are 1 and S_nu = B_nu(T) — a single code path
serves configs 1-5 (BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp

from spectrobot_tpu.constants import C1B, C2


def planck_nu(nu_cm1, T):
    """Spectral radiance B_nu(T) [W m^-2 sr^-1 (cm^-1)^-1], nu in cm^-1."""
    return C1B * nu_cm1 ** 3 / jnp.expm1(C2 * nu_cm1 / T)


def brightness_temperature(nu_cm1, I):
    """Inverse Planck: T_B such that B_nu(T_B) = I, nu in cm^-1.

        T_B = c2 nu / ln(1 + c1 nu^3 / I)

    Non-positive radiances map to 0 K (guarded log1p argument).
    """
    ratio = C1B * nu_cm1 ** 3 / jnp.maximum(I, jnp.asarray(1e-300, I.dtype)
                                            if I.dtype == jnp.float64
                                            else jnp.asarray(1e-38, I.dtype))
    return jnp.where(I > 0.0, C2 * nu_cm1 / jnp.log1p(ratio), 0.0)


def nlte_line_weights(nu0, T, r_lower, r_upper):
    """Per-line non-LTE weights (w_abs, w_em) given population ratios.

    nu0: [L] line centers; T: kinetic temperature (scalar per layer);
    r_lower/r_upper: [L] population ratios of the line's lower/upper levels
    in this layer (1.0 for LTE / unmatched lines).
    """
    E = jnp.exp(-C2 * nu0 / T)
    w_abs = (r_lower - r_upper * E) / (1.0 - E)
    w_em = r_upper
    return w_abs, w_em


def vib_population_ratio(e_level_cm1, T_vib, T_kin):
    """Population ratio n/n^LTE of a vibrational level with energy E [cm-1]
    prescribed by a vibrational temperature T_vib (SURVEY.md C7: prescribed
    vib populations / T_vib profiles):

        r = exp(-c2 E (1/T_vib - 1/T_kin)).
    """
    return jnp.exp(-C2 * e_level_cm1 * (1.0 / T_vib - 1.0 / T_kin))
