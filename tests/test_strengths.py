"""Line strength / width formulas (components C3/C4) vs hand calculations."""

import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.constants import AMU, ATM, C_LIGHT, K_BOLTZ, LN2
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.strengths import (
    device_lines_from_linelist, doppler_hwhm, line_strength, lorentz_hwhm,
    pressure_shifted_center,
)

SPECIES = [(2, 1)]


def _lines():
    return device_lines_from_linelist(co2_15um_band(j_max=20), SPECIES,
                                      dtype=jnp.float64)


def test_strength_at_reference_T_is_sw():
    dl = _lines()
    S = np.asarray(line_strength(dl, 296.0))
    np.testing.assert_allclose(S, np.asarray(dl.sw), rtol=1e-6)


def test_strength_hand_computed():
    dl = _lines()
    from spectrobot_tpu.data import tips
    T = 220.0
    C2 = 1.4387768775039337
    q_ratio = tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T)
    i = 5
    nu0_abs = np.asarray(dl.nu0_abs)
    expect = (np.asarray(dl.sw)[i] * q_ratio
              * np.exp(-C2 * np.asarray(dl.elower)[i] * (1 / T - 1 / 296.0))
              * (1 - np.exp(-C2 * nu0_abs[i] / T))
              / (1 - np.exp(-C2 * nu0_abs[i] / 296.0)))
    S = np.asarray(line_strength(dl, T))[i]
    np.testing.assert_allclose(S, expect, rtol=1e-4)  # table interp tolerance


def test_doppler_width_formula():
    dl = _lines()
    T = 250.0
    ad = np.asarray(doppler_hwhm(dl, T))
    from spectrobot_tpu.data.molparams import MOLECULES
    m = MOLECULES[2].isotopologues[1].mass_amu * AMU
    expect = np.asarray(dl.nu0_abs) / C_LIGHT * np.sqrt(2 * LN2 * K_BOLTZ * T / m)
    np.testing.assert_allclose(ad, expect, rtol=1e-12)
    # Magnitude sanity: CO2 at 667 cm-1, 250 K -> ~5.3e-4 cm-1
    assert 4e-4 < ad.mean() < 7e-4


def test_lorentz_width_and_shift():
    dl = _lines()
    T, p = 296.0, ATM  # 1 atm at reference T
    gl = np.asarray(lorentz_hwhm(dl, T, p, p_self_pa=0.0))
    np.testing.assert_allclose(gl, np.asarray(dl.gamma_air), rtol=1e-6)
    # Self-broadening mix
    gl2 = np.asarray(lorentz_hwhm(dl, T, p, p_self_pa=p))
    np.testing.assert_allclose(gl2, np.asarray(dl.gamma_self), rtol=1e-6)
    # T-dependence
    glT = np.asarray(lorentz_hwhm(dl, 148.0, p))
    np.testing.assert_allclose(
        glT, np.asarray(dl.gamma_air) * 2.0 ** np.asarray(dl.n_air), rtol=1e-6)
    # shift is in OFFSET coordinates (nu0 stores offsets from nu_ref)
    nu_c = np.asarray(pressure_shifted_center(dl, p))
    np.testing.assert_allclose(nu_c + np.asarray(dl.nu_ref),
                               np.asarray(dl.nu0_abs) + np.asarray(dl.delta_air),
                               rtol=1e-9)


def test_species_filtering():
    ll = co2_15um_band(j_max=10)
    dl = device_lines_from_linelist(ll, [(5, 1)], dtype=jnp.float64)
    assert dl.n_lines == 0
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    assert dl.n_lines == len(ll)
    assert np.all(np.asarray(dl.species_idx) == 0)
