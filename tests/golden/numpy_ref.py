"""Independent NumPy/SciPy micro-reference (float64, scalar-simple code).

This is the correctness oracle mandated by SURVEY.md section 5.2: a
slow-but-simple implementation of the LBL physics written WITHOUT the
framework (plain numpy + scipy.special.wofz), so that agreement is evidence
of correctness rather than shared bugs.  It deliberately mirrors textbook
formulas, not the framework's structure.
"""

from __future__ import annotations

import numpy as np
from scipy.special import wofz

# Independent constant definitions (CODATA) — on purpose not imported from
# the package.
C = 2.99792458e8
H = 6.62607015e-34
KB = 1.380649e-23
AMU = 1.66053906660e-27
C2 = H * C / KB * 100.0
C1B = 2.0 * H * C * C * 1e8
TREF = 296.0
ATM_PA = 101325.0
SQLN2 = np.sqrt(np.log(2.0))


def voigt(nu, nu0, alpha_d, gamma_l):
    x = SQLN2 * (nu - nu0) / alpha_d
    y = SQLN2 * gamma_l / alpha_d
    return SQLN2 / np.sqrt(np.pi) / alpha_d * wofz(x + 1j * y).real


def planck(nu, T):
    return C1B * nu ** 3 / (np.exp(C2 * nu / T) - 1.0)


def line_strength(sw, elower, nu0, T, q_ratio):
    """q_ratio = Q(296)/Q(T), supplied by the caller (same tables as the
    framework — TIPS data itself is an input, not physics under test)."""
    boltz = np.exp(-C2 * elower / T) / np.exp(-C2 * elower / TREF)
    stim = (1.0 - np.exp(-C2 * nu0 / T)) / (1.0 - np.exp(-C2 * nu0 / TREF))
    return sw * q_ratio * boltz * stim


def cross_section(nu_grid, ll, T, p_pa, p_self_pa, q_ratio, cutoff=None,
                  w_abs=None, w_em=None, chi_b=None):
    """sigma_abs, sigma_em [cm^2/molec] by direct per-line summation.

    ``chi_b`` [L]: sub-Lorentzian wing slopes — multiplies the line shape
    by exp(-b max(|dnu| - 3, 0)) (the framework's ops/chi.py convention,
    re-stated here independently)."""
    sig_a = np.zeros_like(nu_grid)
    sig_e = np.zeros_like(nu_grid)
    p_atm = p_pa / ATM_PA
    ps_atm = p_self_pa / ATM_PA
    for i in range(len(ll.nu0)):
        m = ll.mass_amu[i] * AMU
        alpha_d = ll.nu0[i] / C * np.sqrt(2.0 * np.log(2.0) * KB * T / m)
        gamma_l = (TREF / T) ** ll.n_air[i] * (
            ll.gamma_air[i] * (p_atm - ps_atm) + ll.gamma_self[i] * ps_atm)
        nu_c = ll.nu0[i] + ll.delta_air[i] * p_atm
        S = line_strength(ll.sw[i], ll.elower[i], ll.nu0[i], T, q_ratio[i])
        v = voigt(nu_grid, nu_c, alpha_d, gamma_l)
        if chi_b is not None:
            v = v * np.exp(-chi_b[i] * np.maximum(
                np.abs(nu_grid - nu_c) - 3.0, 0.0))
        if cutoff is not None:
            v = np.where(np.abs(nu_grid - nu_c) <= cutoff, v, 0.0)
        wa = 1.0 if w_abs is None else w_abs[i]
        we = 1.0 if w_em is None else w_em[i]
        sig_a += S * v * wa
        sig_e += S * v * we
    return sig_a, sig_e


def nadir_single_layer(nu_grid, ll, T_layer, p_pa, column_m2, vmr_self,
                       T_surf, q_ratio, cutoff=None):
    sig, _ = cross_section(nu_grid, ll, T_layer, p_pa, vmr_self * p_pa,
                           q_ratio, cutoff=cutoff)
    tau = sig * column_m2 * 1e-4
    t = np.exp(-tau)
    return planck(nu_grid, T_surf) * t + planck(nu_grid, T_layer) * (1.0 - t)


def radiance_along_ray(dtau, source, I_bg=None):
    """Sequential (loop-based) RT along one ray: dtau/source [n_seg, P]."""
    n_seg, P = dtau.shape
    I = np.zeros(P)
    t = np.ones(P)
    for k in range(n_seg):
        t_next = t * np.exp(-dtau[k])
        I += source[k] * (t - t_next)
        t = t_next
    if I_bg is not None:
        I += I_bg * t
    return I


# ---------------------------------------------------------------------------
# Independent limb geometry + Curtis-Godson + multi-layer RT (configs 2/3)
# ---------------------------------------------------------------------------

def _interp_atm(z_lev, p_lev, T_lev, n_lev_, vmr_lev, z):
    """Linear-T, log-p/log-n interpolation (scalar-simple)."""
    T = np.interp(z, z_lev, T_lev)
    p = np.exp(np.interp(z, z_lev, np.log(p_lev)))
    n = np.exp(np.interp(z, z_lev, np.log(n_lev_)))
    vmr = {k: np.interp(z, z_lev, v) for k, v in vmr_lev.items()}
    return T, p, n, vmr


def limb_layer_cg(z_lev, p_lev, T_lev, n_lev_, vmr_lev, radius, h_t,
                  species, n_sub=4):
    """One-side CG per layer for a limb ray (independent loop-based impl).

    Returns dict with per-layer lists (length n_lay): u[sp], Tbar[sp],
    pbar[sp], pself[sp], T_air.
    """
    n_lay = len(z_lev) - 1
    r_t = radius + h_t
    out = {"u": np.zeros((n_lay, len(species))),
           "T": np.zeros((n_lay, len(species))),
           "p": np.zeros((n_lay, len(species))),
           "ps": np.zeros((n_lay, len(species))),
           "T_air": np.zeros(n_lay),
           "u_air": np.zeros(n_lay),      # int n ds   [molec m^-2], one side
           "uu": np.zeros(n_lay)}         # int n^2 ds [molec^2 m^-5], one side
    for i in range(n_lay):
        r_bot, r_top = radius + z_lev[i], radius + z_lev[i + 1]
        l_bot = np.sqrt(max(r_bot ** 2 - r_t ** 2, 0.0))
        l_top = np.sqrt(max(r_top ** 2 - r_t ** 2, 0.0))
        dl = l_top - l_bot
        if dl <= 0:
            out["T_air"][i] = 200.0
            out["T"][i] = 200.0
            out["p"][i] = 1.0
            continue
        acc_u = np.zeros(len(species)); acc_T = np.zeros(len(species))
        acc_p = np.zeros(len(species)); acc_ps = np.zeros(len(species))
        acc_nT = 0.0; acc_n = 0.0; acc_nn = 0.0
        for k in range(n_sub):
            l = l_bot + (k + 0.5) * dl / n_sub
            z = np.sqrt(r_t ** 2 + l ** 2) - radius
            T, p, n, vmr = _interp_atm(z_lev, p_lev, T_lev, n_lev_, vmr_lev, z)
            w = dl / n_sub
            acc_n += n * w
            acc_nn += n * n * w
            acc_nT += T * n * w
            for s, name in enumerate(species):
                ns = n * vmr[name]
                acc_u[s] += ns * w
                acc_T[s] += T * ns * w
                acc_p[s] += p * ns * w
                acc_ps[s] += p * vmr[name] * ns * w
        out["u"][i] = acc_u
        safe = np.maximum(acc_u, 1e-300)
        out["T"][i] = np.where(acc_u > 0, acc_T / safe, 200.0)
        out["p"][i] = np.where(acc_u > 0, acc_p / safe, 1.0)
        out["ps"][i] = np.where(acc_u > 0, acc_ps / safe, 0.0)
        out["T_air"][i] = acc_nT / acc_n if acc_n > 0 else 200.0
        out["u_air"][i] = acc_n
        out["uu"][i] = acc_nn
    return out


def cia_dtau_layers(nu, cg, species, pair, table_nu, table_T, table_k):
    """Per-layer CIA continuum optical depth [n_lay, P] (one-side path).

    Independent quadrature of dtau_cia = x_a x_b (int n^2 ds) k(T_air, nu)
    with k the binary absorption table [cm^5 molec^-2] on (table_T,
    table_nu): linear in nu (0 outside the table), linear CLAMPED in T.
    ``cg`` comes from :func:`limb_layer_cg` (or the nadir analog) and
    carries u [molec m^-2], u_air, uu [molec^2 m^-5]; 1 m^-5 = 1e-10 cm^-5
    converts the path integral to the table's cm units.
    """
    n_lay = len(cg["T_air"])
    ia, ib = species.index(pair[0]), species.index(pair[1])
    out = np.zeros((n_lay, len(nu)))
    for i in range(n_lay):
        if cg["u_air"][i] <= 0:
            continue
        x_a = cg["u"][i, ia] / cg["u_air"][i]
        x_b = cg["u"][i, ib] / cg["u_air"][i]
        T = np.clip(cg["T_air"][i], table_T[0], table_T[-1])
        j = min(np.searchsorted(table_T, T, side="right"), len(table_T) - 1)
        j = max(j, 1)
        a = (T - table_T[j - 1]) / (table_T[j] - table_T[j - 1])
        k_T = (1.0 - a) * table_k[j - 1] + a * table_k[j]      # [Pc]
        k_nu = np.interp(nu, table_nu, k_T, left=0.0, right=0.0)
        out[i] = x_a * x_b * (cg["uu"][i] * 1e-10) * k_nu
    return out


def fov_weights(h_fine, h_centers, fwhm, cutoff_fwhm=6.0):
    """[n_obs, n_fine] area-normalised Gaussian FOV weights over the
    tangent-height ladder (trapezoid quadrature of the fine ladder) —
    the independent statement of what an FOV smear IS."""
    h_fine = np.asarray(h_fine, np.float64)
    dx = h_fine[None, :] - np.asarray(h_centers, np.float64)[:, None]
    w = np.exp(-4.0 * np.log(2.0) * (dx / fwhm) ** 2)
    w = np.where(np.abs(dx) <= cutoff_fwhm * fwhm, w, 0.0)
    w = w * np.gradient(h_fine)[None, :]
    return w / w.sum(axis=1, keepdims=True)


def nadir_layer_cg(z_lev, p_lev, T_lev, n_lev_, vmr_lev, sec, species,
                   n_sub=4):
    """Per-layer CG for a nadir ray with zenith secant ``sec`` (independent
    midpoint quadrature in altitude; path weight dz*sec/n_sub)."""
    n_lay = len(z_lev) - 1
    out = {"u": np.zeros((n_lay, len(species))),
           "T": np.zeros((n_lay, len(species))),
           "p": np.zeros((n_lay, len(species))),
           "ps": np.zeros((n_lay, len(species))),
           "T_air": np.zeros(n_lay),
           "u_air": np.zeros(n_lay),
           "uu": np.zeros(n_lay)}
    for i in range(n_lay):
        dz = z_lev[i + 1] - z_lev[i]
        acc_u = np.zeros(len(species)); acc_T = np.zeros(len(species))
        acc_p = np.zeros(len(species)); acc_ps = np.zeros(len(species))
        acc_nT = 0.0; acc_n = 0.0; acc_nn = 0.0
        for k in range(n_sub):
            z = z_lev[i] + (k + 0.5) * dz / n_sub
            T, p, n, vmr = _interp_atm(z_lev, p_lev, T_lev, n_lev_, vmr_lev, z)
            w = dz * sec / n_sub
            acc_n += n * w
            acc_nn += n * n * w
            acc_nT += T * n * w
            for s, name in enumerate(species):
                ns = n * vmr[name]
                acc_u[s] += ns * w
                acc_T[s] += T * ns * w
                acc_p[s] += p * ns * w
                acc_ps[s] += p * vmr[name] * ns * w
        out["u"][i] = acc_u
        safe = np.maximum(acc_u, 1e-300)
        out["T"][i] = np.where(acc_u > 0, acc_T / safe, 200.0)
        out["p"][i] = np.where(acc_u > 0, acc_p / safe, 1.0)
        out["ps"][i] = np.where(acc_u > 0, acc_ps / safe, 0.0)
        out["T_air"][i] = acc_nT / acc_n if acc_n > 0 else 200.0
        out["u_air"][i] = acc_n
        out["uu"][i] = acc_nn
    return out


def _layer_tau_src(nu, line_lists, cg, species, q_ratio_fn, cutoff,
                   nlte_weights_fn=None, cia=None):
    """Shared per-layer (dtau, source) assembly from a CG dict."""
    n_lay = len(cg["T_air"])
    dtau = np.zeros((n_lay, len(nu)))
    dtau_em = np.zeros((n_lay, len(nu)))
    for i in range(n_lay):
        for s, name in enumerate(species):
            if cg["u"][i, s] <= 0:
                continue
            ll = line_lists[name]
            T, p, ps = cg["T"][i, s], cg["p"][i, s], cg["ps"][i, s]
            qr = q_ratio_fn(name, T)
            if nlte_weights_fn is not None:
                wa, we = nlte_weights_fn(name, i, cg["T_air"][i])
            else:
                wa = we = None
            sa, se = cross_section(nu, ll, T, p, ps, qr, cutoff=cutoff,
                                   w_abs=wa, w_em=we)
            u_cm2 = cg["u"][i, s] * 1e-4
            dtau[i] += sa * u_cm2
            dtau_em[i] += se * u_cm2
    if cia is not None:
        dc = cia_dtau_layers(nu, cg, species, *cia)
        dtau = dtau + dc
        dtau_em = dtau_em + dc          # CIA thermalises at T_air
    B = planck(nu[None, :], cg["T_air"][:, None])
    with np.errstate(invalid="ignore", divide="ignore"):
        src = B * np.where(dtau > 0, dtau_em / np.maximum(dtau, 1e-300), 1.0)
    return dtau, src


def limb_radiance(nu, line_lists, z_lev, p_lev, T_lev, n_lev_, vmr_lev,
                  radius, h_t, species, q_ratio_fn, cutoff=25.0, n_sub=4,
                  nlte_weights_fn=None, cia=None):
    """Limb radiance for one tangent height (independent implementation).

    line_lists: dict species_name -> LineList; q_ratio_fn(name, T) -> [L]
    Q(296)/Q(T); nlte_weights_fn(name, lay, T_kin) -> (w_abs [L], w_em [L])
    or None for LTE; ``cia`` = (pair, table_nu, table_T, table_k) adds the
    collision-induced continuum (cia_dtau_layers).
    """
    n_lay = len(z_lev) - 1
    cg = limb_layer_cg(z_lev, p_lev, T_lev, n_lev_, vmr_lev, radius, h_t,
                       species, n_sub)
    dtau, src = _layer_tau_src(nu, line_lists, cg, species, q_ratio_fn,
                               cutoff, nlte_weights_fn, cia)
    # observer-first: near side top->bottom then far side bottom->top
    order = np.concatenate([np.arange(n_lay)[::-1], np.arange(n_lay)])
    return radiance_along_ray(dtau[order], src[order])


def nadir_radiance_grey(nu, line_lists, z_lev, p_lev, T_lev, n_lev_,
                        vmr_lev, sec, species, q_ratio_fn, T_surf,
                        emissivity=1.0, cutoff=25.0, n_sub=4, cia=None):
    """Nadir radiance over a grey Lambertian surface (independent impl):

        I = RT(top->bottom; I_bg),
        I_bg = eps B(T_s) + (1 - eps) I_down,
        I_down = RT(bottom->top, deep space behind)

    — the same layer optics integrated surface-first give the reflected
    downwelling term, matching the framework's convention
    (forward/limb.py:tau_radiance_epilogue / downwelling_radiance).
    """
    n_lay = len(z_lev) - 1
    cg = nadir_layer_cg(z_lev, p_lev, T_lev, n_lev_, vmr_lev, sec, species,
                        n_sub)
    dtau, src = _layer_tau_src(nu, line_lists, cg, species, q_ratio_fn,
                               cutoff, None, cia)
    down = np.arange(n_lay)                      # surface-first, upward
    I_down = radiance_along_ray(dtau[down], src[down])
    I_bg = emissivity * planck(nu, T_surf) + (1.0 - emissivity) * I_down
    up = np.arange(n_lay)[::-1]                  # observer-first, downward
    return radiance_along_ray(dtau[up], src[up], I_bg=I_bg)
