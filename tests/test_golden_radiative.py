"""Independent-oracle validation for CIA radiance, FOV smearing, and the
nadir grey-surface reflected downwelling (VERDICT r4 item 4).

Until round 5 these three radiative features were validated only
framework-vs-framework (mesh-vs-single-device, differs-and-thermalised
checks), so a sign/convention error common to all paths would have passed.
Here each is asserted against tests/golden/numpy_ref.py — the scalar-simple
scipy.wofz float64 oracle that validates configs 1-3 — extended with its
own CIA trapezoid path integral, FOV weight quadrature, and two-pass
up/down RT.
"""

import jax
import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.data import tips
from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.forward.geometry import limb_path_cg, nadir_path_cg
from spectrobot_tpu.forward.limb import limb_radiance, nadir_radiance
from spectrobot_tpu.ops.cia import CIATable, stage_cia
from spectrobot_tpu.ops.ils import apply_fov, fov_matrix
from spectrobot_tpu.ops.strengths import device_lines_from_linelist

SPECIES = ["CO2"]


def _scene(n_lev=13, nu_lo=655.0, nu_hi=672.0, P=601, j_max=12):
    atm = mars_standard_atmosphere(n_lev=n_lev, z_top=70e3)
    ll = co2_15um_band(j_max=j_max)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    nu = np.linspace(nu_lo, nu_hi, P)
    return atm, ll, dl, nu


def _q_ratio_fn(ll):
    def q_ratio_fn(name, T):
        qr = tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T)
        return np.full(len(ll), qr)
    return q_ratio_fn


def _atm_arrays(atm):
    return (np.asarray(atm.z), np.asarray(atm.p), np.asarray(atm.T),
            np.asarray(atm.n), {k: np.asarray(v) for k, v in atm.vmr.items()})


def test_cia_limb_radiance_vs_oracle():
    """CIA continuum IN THE RADIANCE: framework limb forward with the
    staged CO2-CO2 table vs the oracle's independent x_a x_b (int n^2 ds)
    k(T_air, nu) trapezoid path — same table DATA (an input, like TIPS),
    fully independent path integral, interpolation, and RT."""
    # Band-shoulder window (676-700 cm^-1): the line core is optically
    # thick, where ANY continuum perturbation is invisible in radiance —
    # the shoulder keeps the comparison non-vacuous.
    atm, ll, dl, nu = _scene(nu_lo=676.0, nu_hi=700.0, P=401)
    # Synthetic in-window table (TEST DATA — the demo table's humps sit at
    # 50 and 1300 cm^-1, zero here): a Gaussian feature at 688 cm^-1,
    # ~T^-1 scaling, amplitude sized for a visible dtau on the low ray.
    nu_t = np.linspace(650.0, 720.0, 141)
    T_t = np.array([120.0, 180.0, 240.0, 300.0])
    k_t = (1e-43 * np.exp(-0.5 * ((nu_t - 688.0) / 15.0) ** 2)[None, :]
           * (200.0 / T_t[:, None]))
    table = CIATable("CO2", "CO2", nu_t, T_t, k_t)
    cia = stage_cia(jnp.asarray(nu), [table], SPECIES, jnp.float64)
    assert cia is not None
    h_t = np.array([8e3, 25e3, 45e3])
    cg = limb_path_cg(atm, SPECIES, jnp.asarray(h_t), MARS, n_sub=4)
    got = np.asarray(jax.jit(
        lambda: limb_radiance(jnp.asarray(nu), dl, cg, cia=cia,
                              variant="weideman", cutoff_cm1=25.0))())
    got_nocia = np.asarray(jax.jit(
        lambda: limb_radiance(jnp.asarray(nu), dl, cg,
                              variant="weideman", cutoff_cm1=25.0))())
    z, p, T, n, vmr = _atm_arrays(atm)
    cia_args = (("CO2", "CO2"), table.nu_grid, table.T_grid, table.k)
    for r, ht in enumerate(h_t):
        ref = numpy_ref.limb_radiance(
            nu, {"CO2": ll}, z, p, T, n, vmr, MARS.radius_m, ht, SPECIES,
            _q_ratio_fn(ll), cutoff=25.0, n_sub=4, cia=cia_args)
        scale = ref.max()
        np.testing.assert_allclose(got[r], ref, rtol=2e-4,
                                   atol=scale * 1e-7, err_msg=f"ray {r}")
    # And the continuum actually matters in this assertion (the comparison
    # must not pass vacuously because CIA is negligible).
    assert np.max(np.abs(got - got_nocia)) > 1e-3 * got.max()


def test_fov_ladder_vs_oracle():
    """FOV smearing: the framework's fov_matrix + apply_fov over a fine
    tangent ladder vs the oracle's own Gaussian-quadrature weights applied
    to oracle per-ray radiances."""
    atm, ll, dl, nu = _scene(P=401)
    h_fine = np.linspace(6e3, 46e3, 11)
    h_obs = np.array([16e3, 30e3])
    fwhm = 6e3
    cg = limb_path_cg(atm, SPECIES, jnp.asarray(h_fine), MARS, n_sub=3)
    V = jnp.asarray(fov_matrix(h_fine, h_obs, fwhm))
    got = np.asarray(jax.jit(
        lambda: apply_fov(limb_radiance(jnp.asarray(nu), dl, cg,
                                        variant="weideman", cutoff_cm1=25.0),
                          V))())
    z, p, T, n, vmr = _atm_arrays(atm)
    I_fine = np.stack([
        numpy_ref.limb_radiance(nu, {"CO2": ll}, z, p, T, n, vmr,
                                MARS.radius_m, ht, SPECIES, _q_ratio_fn(ll),
                                cutoff=25.0, n_sub=3)
        for ht in h_fine])
    W_ref = numpy_ref.fov_weights(h_fine, h_obs, fwhm)
    ref = W_ref @ I_fine
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=ref.max() * 1e-7)
    # Non-vacuous: the smear differs from the nearest single ray.
    nearest = I_fine[np.abs(h_fine[None, :] - h_obs[:, None]).argmin(1)]
    assert np.max(np.abs(ref - nearest)) > 1e-3 * ref.max()


def test_nadir_reflected_downwelling_vs_oracle():
    """Nadir over a grey surface (emissivity 0.7): framework vs the
    oracle's explicit two-pass RT (downwelling at the surface, then
    eps B(T_s) + (1-eps) I_down behind the upward pass).  The window sits
    on the band shoulder (685-705 cm^-1) so the surface is visible and the
    reflection term is non-negligible."""
    atm, ll, dl, nu = _scene(n_lev=9, nu_lo=685.0, nu_hi=705.0, P=401)
    sec = 1.15
    emis = 0.7
    T_s = 255.0
    cg = nadir_path_cg(atm, SPECIES, jnp.asarray([sec]), n_sub=4)
    got = np.asarray(jax.jit(
        lambda: nadir_radiance(jnp.asarray(nu), dl, cg, T_s,
                               emissivity=emis, variant="weideman",
                               cutoff_cm1=25.0))())[0]
    got_black = np.asarray(jax.jit(
        lambda: nadir_radiance(jnp.asarray(nu), dl, cg, T_s,
                               emissivity=1.0, variant="weideman",
                               cutoff_cm1=25.0))())[0]
    z, p, T, n, vmr = _atm_arrays(atm)
    ref = numpy_ref.nadir_radiance_grey(
        nu, {"CO2": ll}, z, p, T, n, vmr, sec, SPECIES, _q_ratio_fn(ll),
        T_s, emissivity=emis, cutoff=25.0, n_sub=4)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=ref.max() * 1e-7)
    # Non-vacuous: the reflection term visibly changes the spectrum vs a
    # black surface, and the oracle catches a sign flip in (1 - eps).
    assert np.max(np.abs(got - got_black)) > 1e-3 * got.max()
    ref_wrong = numpy_ref.nadir_radiance_grey(
        nu, {"CO2": ll}, z, p, T, n, vmr, sec, SPECIES, _q_ratio_fn(ll),
        T_s, emissivity=1.3, cutoff=25.0, n_sub=4)   # flips (1-eps) sign
    assert not np.allclose(got, ref_wrong, rtol=2e-4)
