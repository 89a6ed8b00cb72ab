"""Line-strength T-scaling and line widths (components C3/C4, SURVEY.md).

The reference (fedef17/SpectRobot ``spect_classes.py``) applies the standard
HITRAN temperature scaling per line object; here it is vectorised jnp over
struct-of-arrays line parameters, fused by XLA into the kernel prologue
(SURVEY.md C3: "vectorized jnp; fused into kernel prologue").

All functions broadcast: line parameter arrays have shape [L]; thermodynamic
state (T, p, ...) may be scalars or [..., 1] for layer batching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.constants import (
    AMU, ATM, C2, C_LIGHT, K_BOLTZ, LN2, T_REF,
)


class DeviceLines(NamedTuple):
    """Device-resident struct-of-arrays line parameters (compute dtype).

    ``q_ratio_tbl``/``q_tgrid`` hold the packed partition-sum tables
    (per species row) and ``species_idx`` maps each line to its row, so
    Q(296)/Q(T) is a gather + interp on device.

    PRECISION: ``nu0`` is stored as an OFFSET from ``nu_ref`` (a scalar,
    subtracted host-side in float64).  At 650 cm-1 a float32 wavenumber
    quantises at ~3e-5 cm-1 — comparable to Doppler widths — so absolute
    f32 coordinates lose percent-level accuracy in line cores; offsets from
    the window centre keep dnu accurate to ~1e-6 cm-1.  Quantities needing
    the ABSOLUTE wavenumber (strength scaling, Doppler width, Planck) use
    nu0_abs = nu0 + nu_ref, where f32 rounding is harmless (relative 5e-8).
    """

    nu0: jnp.ndarray          # [L] line centers, OFFSET from nu_ref [cm-1]
    sw: jnp.ndarray           # [L] strength at 296 K
    elower: jnp.ndarray       # [L] lower-state energy [cm-1]
    gamma_air: jnp.ndarray    # [L]
    gamma_self: jnp.ndarray   # [L]
    n_air: jnp.ndarray        # [L]
    delta_air: jnp.ndarray    # [L]
    mass_amu: jnp.ndarray     # [L]
    species_idx: jnp.ndarray  # [L] int32 row into q_tbl / vmr stack
    level_upper: jnp.ndarray  # [L] int32 non-LTE level index (-1 = LTE)
    level_lower: jnp.ndarray  # [L] int32
    q_tbl: jnp.ndarray        # [n_species, n_T] partition sums
    q_tgrid: jnp.ndarray      # [n_T] temperature grid of q_tbl
    nu_ref: jnp.ndarray       # scalar wavenumber origin [cm-1]

    @property
    def n_lines(self) -> int:
        return int(self.nu0.shape[0])

    @property
    def nu0_abs(self) -> jnp.ndarray:
        return self.nu0 + self.nu_ref


def device_lines_from_linelist(ll, species, dtype=jnp.float32,
                               nu_ref: float = None) -> DeviceLines:
    """Stage a host LineList onto device arrays.

    ``species`` is an ordered list of (mol_id, iso_id) defining the species
    axis (partition-table rows, VMR rows).  Lines whose (mol, iso) is not in
    ``species`` are dropped.  Per SURVEY.md C1 the list arrives sorted by nu0.

    ``nu_ref`` (default: midpoint of the line range, rounded) rebases line
    centers to float32-safe offsets; pass 0.0 to store absolute wavenumbers.
    """
    from spectrobot_tpu.data import tips

    key = {tuple(s): i for i, s in enumerate(species)}
    pair = np.stack([ll.mol_id, ll.iso_id], axis=1)
    sp = np.array([key.get((int(m), int(i)), -1) for m, i in pair], dtype=np.int32)
    keep = sp >= 0
    idx = np.nonzero(keep)[0]

    if nu_ref is None:
        nu_ref = (float(np.round(0.5 * (ll.nu0[idx].min() + ll.nu0[idx].max())))
                  if len(idx) else 0.0)

    q_tbl = tips.pack_q_tables([tuple(s) for s in species])
    return DeviceLines(
        nu0=jnp.asarray(ll.nu0[idx] - nu_ref, dtype=dtype),
        sw=jnp.asarray(ll.sw[idx], dtype=dtype),
        elower=jnp.asarray(ll.elower[idx], dtype=dtype),
        gamma_air=jnp.asarray(ll.gamma_air[idx], dtype=dtype),
        gamma_self=jnp.asarray(ll.gamma_self[idx], dtype=dtype),
        n_air=jnp.asarray(ll.n_air[idx], dtype=dtype),
        delta_air=jnp.asarray(ll.delta_air[idx], dtype=dtype),
        mass_amu=jnp.asarray(ll.mass_amu[idx], dtype=dtype),
        species_idx=jnp.asarray(sp[idx], dtype=jnp.int32),
        level_upper=jnp.asarray(ll.level_upper[idx], dtype=jnp.int32),
        level_lower=jnp.asarray(ll.level_lower[idx], dtype=jnp.int32),
        q_tbl=jnp.asarray(q_tbl, dtype=dtype),
        q_tgrid=jnp.asarray(tips.T_GRID, dtype=dtype),
        nu_ref=jnp.asarray(nu_ref, dtype=dtype),
    )


def partition_ratio(lines: DeviceLines, T) -> jnp.ndarray:
    """Q(T_ref)/Q(T) per line via the packed tables.

    T may be scalar or broadcastable against [L].
    """
    tgrid = lines.q_tgrid
    # Fractional index into the uniform T grid.
    dt_grid = tgrid[1] - tgrid[0]
    f = (jnp.asarray(T) - tgrid[0]) / dt_grid
    f = jnp.clip(f, 0.0, tgrid.shape[0] - 1.000001)
    i0 = jnp.floor(f).astype(jnp.int32)
    frac = f - i0
    rows = lines.q_tbl[lines.species_idx]          # [L, n_T]
    # Gather the two bracketing samples along the T axis.
    qT = jnp.take_along_axis(rows, jnp.broadcast_to(i0, lines.nu0.shape)[:, None], axis=1)[:, 0] * (1 - frac) \
        + jnp.take_along_axis(rows, jnp.broadcast_to(i0 + 1, lines.nu0.shape)[:, None], axis=1)[:, 0] * frac
    # Q at the reference temperature (same gather, static index).
    f_ref = (T_REF - tgrid[0]) / dt_grid
    i_ref = jnp.floor(f_ref).astype(jnp.int32)
    fr_ref = f_ref - i_ref
    q_ref = rows[:, i_ref] * (1 - fr_ref) + rows[:, i_ref + 1] * fr_ref
    return q_ref / qT


def line_strength(lines: DeviceLines, T) -> jnp.ndarray:
    """S(T) per line [cm-1/(molec cm-2)] — HITRAN scaling law.

    S(T) = S_296 * Q(296)/Q(T) * exp(-c2 E''/T)/exp(-c2 E''/296)
                 * (1 - exp(-c2 nu0/T)) / (1 - exp(-c2 nu0/296)).
    """
    qr = partition_ratio(lines, T)
    boltz = jnp.exp(-C2 * lines.elower * (1.0 / T - 1.0 / T_REF))
    nu_abs = lines.nu0_abs
    stim = (1.0 - jnp.exp(-C2 * nu_abs / T)) / (1.0 - jnp.exp(-C2 * nu_abs / T_REF))
    return lines.sw * qr * boltz * stim


def doppler_hwhm(lines: DeviceLines, T) -> jnp.ndarray:
    """Doppler half-width at half-maximum [cm-1]:
    alpha_D = nu0/c * sqrt(2 ln2 kT / m)."""
    m_kg = lines.mass_amu * AMU
    return lines.nu0_abs / C_LIGHT * jnp.sqrt(2.0 * LN2 * K_BOLTZ * T / m_kg)


def lorentz_hwhm(lines: DeviceLines, T, p_pa, p_self_pa=0.0) -> jnp.ndarray:
    """Pressure-broadened HWHM [cm-1]:
    gamma_L = (296/T)^n_air * (gamma_air (p - p_self) + gamma_self p_self),
    pressures in atm."""
    p_atm = p_pa / ATM
    ps_atm = p_self_pa / ATM
    return (T_REF / T) ** lines.n_air * (
        lines.gamma_air * (p_atm - ps_atm) + lines.gamma_self * ps_atm
    )


def pressure_shifted_center(lines: DeviceLines, p_pa) -> jnp.ndarray:
    """nu0' = nu0 + delta_air * p[atm] — OFFSET coordinates [cm-1]."""
    return lines.nu0 + lines.delta_air * (p_pa / ATM)
