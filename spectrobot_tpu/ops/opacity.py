"""Opacity accumulation (component C6, SURVEY.md) — two-stage design.

Stage 1 (:func:`line_kernel_inputs`, the "kernel prologue" of SURVEY.md C3):
per-line physics — strength T-scaling, widths, pressure shift, non-LTE and
column weights — producing the minimal flat arrays the accumulator consumes:

    nu_c     [L]        shifted line center [cm-1]
    scale_x  [L]        sqrt(ln2)/alpha_D  (x = (nu - nu_c) * scale_x)
    y        [L]        sqrt(ln2) * gamma_L / alpha_D
    amps     [n_out, L] per-line amplitudes, ALL prefactors folded in:
                        amp = S(T) * w * sqrt(ln2/pi)/alpha_D * u
Stage 2 (:func:`accumulate_jnp` / the Pallas kernel in
:mod:`spectrobot_tpu.ops.pallas_opacity`): the hot loop

    out[o, p] = sum_i amps[o, i] * Re w(x_ip, y_i)

i.e. exactly the (spectral-point x line) evaluations of BASELINE.json:2.
Accumulating ``n_out`` spectra at once (absorption + emission weights) costs
one Voigt evaluation, not two — the non-LTE design of ops/planck.py.

Everything per-line broadcasts, so T/p may be per-line arrays: that is how
per-SPECIES Curtis-Godson states are honoured in a single multi-species sum
(scatter the per-species (T, p) to lines via ``species_idx``).

The reference (fedef17/SpectRobot) implements this loop in Fortran/`wofz`
per line (SURVEY.md C5/C6, call stack 4.1 "HOT LOOP" — 99% of runtime).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spectrobot_tpu.constants import SQRT_LN2, SQRT_LN2_PI
from spectrobot_tpu.ops import voigt as voigt_mod
from spectrobot_tpu.ops.strengths import (
    DeviceLines, doppler_hwhm, line_strength, lorentz_hwhm,
    pressure_shifted_center,
)


class KernelLines(NamedTuple):
    """Flat per-line inputs of the accumulation kernel."""
    nu_c: jnp.ndarray      # [L]
    scale_x: jnp.ndarray   # [L]
    y: jnp.ndarray         # [L]
    amps: jnp.ndarray      # [n_out, L]


def line_kernel_inputs(
    lines: DeviceLines,
    T,
    p_pa,
    p_self_pa=0.0,
    amp_weights: Optional[jnp.ndarray] = None,
) -> KernelLines:
    """Stage-1 prologue: thermodynamic state -> flat kernel inputs.

    T / p_pa / p_self_pa: scalars or [L] per-line arrays (per-species CG
    states scattered onto lines).  amp_weights: [n_out, L] extra per-line
    amplitude weights (column x non-LTE); default a single all-ones row.
    """
    S = line_strength(lines, T)
    ad = doppler_hwhm(lines, T)
    gl = lorentz_hwhm(lines, T, p_pa, p_self_pa)
    nu_c = pressure_shifted_center(lines, p_pa)
    inv_ad = 1.0 / ad
    base = S * (SQRT_LN2_PI * inv_ad)
    if amp_weights is None:
        amps = base[None, :]
    else:
        amps = amp_weights * base[None, :]
    return KernelLines(
        nu_c=nu_c,
        scale_x=SQRT_LN2 * inv_ad,
        y=SQRT_LN2 * gl * inv_ad,
        amps=amps,
    )


def accumulate_jnp(
    nu_grid: jnp.ndarray,
    kl: KernelLines,
    *,
    chunk: int = 256,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
) -> jnp.ndarray:
    """Stage-2 hot loop, pure-jnp (XLA) implementation.

    Chunks the line axis with ``lax.scan`` to bound the (chunk x P)
    intermediate.  Returns [n_out, P].
    """
    dt = nu_grid.dtype
    nu_c = kl.nu_c.astype(dt)
    sx = kl.scale_x.astype(dt)
    y = kl.y.astype(dt)
    amps = kl.amps.astype(dt)
    n_out, L = amps.shape

    Lp = ((L + chunk - 1) // chunk) * chunk
    pad = Lp - L
    if pad:
        nu_c = jnp.pad(nu_c, (0, pad))
        sx = jnp.pad(sx, (0, pad), constant_values=1.0)
        y = jnp.pad(y, (0, pad), constant_values=1.0)
        amps = jnp.pad(amps, ((0, 0), (0, pad)))
    n_chunks = Lp // chunk
    stacked = (
        nu_c.reshape(n_chunks, chunk),
        sx.reshape(n_chunks, chunk),
        y.reshape(n_chunks, chunk),
        amps.reshape(n_out, n_chunks, chunk).transpose(1, 0, 2),
    )

    wofz = (voigt_mod.wofz_humlicek4 if variant == "humlicek4"
            else voigt_mod.wofz_weideman)

    def body(acc, ch):
        nc, s, yy, am = ch
        dnu = nu_grid[None, :] - nc[:, None]              # [chunk, P]
        x = s[:, None] * dnu
        yb = jnp.broadcast_to(yy[:, None], x.shape)
        wr, _ = wofz(x, yb)
        if cutoff_cm1 is not None:
            wr = jnp.where(jnp.abs(dnu) <= cutoff_cm1, wr, 0.0)
        # [n_out, P] += [n_out, chunk] @ [chunk, P] — MXU-friendly contraction.
        acc = acc + jnp.einsum("oc,cp->op", am, wr)
        return acc, None

    init = jnp.zeros((n_out, nu_grid.shape[0]), dtype=dt)
    out, _ = jax.lax.scan(body, init, stacked)
    return out


def cross_sections(
    nu_grid: jnp.ndarray,
    lines: DeviceLines,
    T,
    p_pa,
    p_self_pa=0.0,
    w_abs: Optional[jnp.ndarray] = None,
    w_em: Optional[jnp.ndarray] = None,
    *,
    chunk: int = 256,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absorption & emission cross sections [cm^2/molec] for one homogeneous
    state — thin wrapper over the two-stage API (kept as the stable public
    interface; SURVEY.md C6)."""
    L = lines.n_lines
    ones = jnp.ones((L,), dtype=jnp.result_type(lines.sw))
    wa = ones if w_abs is None else w_abs
    we = ones if w_em is None else w_em
    kl = line_kernel_inputs(lines, T, p_pa, p_self_pa,
                            amp_weights=jnp.stack([wa, we]))
    out = accumulate_jnp(nu_grid, kl, chunk=chunk, variant=variant,
                         cutoff_cm1=cutoff_cm1)
    return out[0], out[1]


def cross_sections_batch(
    nu_grid, lines, T_lay, p_lay, p_self_lay, w_abs_lay=None, w_em_lay=None,
    **kw,
):
    """Per-layer cross sections: T_lay/p_lay/p_self_lay are [n_lay];
    weights [n_lay, L] or None.  Returns (sigma_abs, sigma_em) [n_lay, P]."""
    if w_abs_lay is None:
        f = jax.vmap(lambda T, p, ps: cross_sections(
            nu_grid, lines, T, p, ps, None, None, **kw))
        return f(T_lay, p_lay, p_self_lay)
    f = jax.vmap(lambda T, p, ps, wa, we: cross_sections(
        nu_grid, lines, T, p, ps, wa, we, **kw))
    return f(T_lay, p_lay, p_self_lay, w_abs_lay, w_em_lay)
