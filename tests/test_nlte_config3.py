"""Acceptance config 3 (BASELINE.json:9): non-LTE CO2 4.3 um limb emission
with prescribed vibrational populations — level matching, weight algebra and
the full limb pipeline vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.constants import C2
from spectrobot_tpu.data import tips
from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.nlte import (
    device_nlte, lte_t_vib, match_lines_to_levels, registry_from_linelist,
    weights_for_layer,
)
from spectrobot_tpu.data.synth import co2_43um_band, co2_43um_hot_band
from spectrobot_tpu.forward.geometry import limb_path_cg
from spectrobot_tpu.forward.limb import limb_radiance
from spectrobot_tpu.ops.strengths import device_lines_from_linelist

SPECIES_PAIRS = [(2, 1)]
SPECIES_NAMES = ["CO2"]

_jit_limb = jax.jit(limb_radiance,
                    static_argnames=("variant", "cutoff_cm1", "chunk"))


def _scene():
    atm = mars_standard_atmosphere(n_lev=16, z_top=90e3)
    ll = co2_43um_band(j_max=15).concat(co2_43um_hot_band(j_max=10))
    reg = registry_from_linelist(ll)
    ll = match_lines_to_levels(ll, reg)
    dl = device_lines_from_linelist(ll, SPECIES_PAIRS, dtype=jnp.float64)
    nu = np.linspace(2320.0, 2360.0, 801)
    return atm, ll, reg, dl, nu


def _tvib_profiles(reg, atm):
    """Kinetic temps per layer + an excited nu3 stack above ~50 km."""
    z_lev = np.asarray(atm.z)
    z_mid = 0.5 * (z_lev[1:] + z_lev[:-1])
    T_lay = np.interp(z_mid, z_lev, np.asarray(atm.T))
    t_vib = lte_t_vib(reg, T_lay)
    boost = 1.0 + 0.35 * np.clip((z_mid - 50e3) / 40e3, 0.0, 1.0)
    for i, (m, iso, q) in enumerate(reg.keys):
        if q in ("0001", "0111"):  # nu3-excited levels pumped aloft
            t_vib[i] = T_lay * boost
    return t_vib, T_lay


def test_registry_and_matching():
    _, ll, reg, dl, _ = _scene()
    assert reg.n_levels == 4  # 0000, 0110, 0001, 0111
    assert np.all(ll.level_upper >= 0)
    assert np.all(ll.level_lower >= 0)
    # Fundamental band: lower level is the ground state (energy 0).
    ground = reg.lookup(2, 1, "0000")
    assert reg.energies_cm1[ground] < 1.0
    nu3 = reg.lookup(2, 1, "0001")
    assert abs(reg.energies_cm1[nu3] - 2349.14) < 2.0


def test_lte_weights_are_unity():
    atm, ll, reg, dl, _ = _scene()
    t_vib, T_lay = _tvib_profiles(reg, atm)
    nlte = device_nlte(reg, lte_t_vib(reg, T_lay), dtype=jnp.float64)
    wa, we = weights_for_layer(nlte, dl, 3, float(T_lay[3]))
    np.testing.assert_allclose(np.asarray(wa), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(we), 1.0, rtol=1e-10)


def test_weights_formula():
    atm, ll, reg, dl, _ = _scene()
    t_vib, T_lay = _tvib_profiles(reg, atm)
    nlte = device_nlte(reg, t_vib, dtype=jnp.float64)
    lay = len(T_lay) - 2
    T_kin = float(T_lay[lay])
    wa, we = weights_for_layer(nlte, dl, lay, T_kin)
    # Hand-compute for line 0.
    iu, il = int(ll.level_upper[0]), int(ll.level_lower[0])
    r_u = np.exp(-C2 * reg.energies_cm1[iu] * (1 / t_vib[iu, lay] - 1 / T_kin))
    r_l = np.exp(-C2 * reg.energies_cm1[il] * (1 / t_vib[il, lay] - 1 / T_kin))
    E = np.exp(-C2 * ll.nu0[0] / T_kin)
    np.testing.assert_allclose(float(wa[0]), (r_l - r_u * E) / (1 - E), rtol=1e-10)
    np.testing.assert_allclose(float(we[0]), r_u, rtol=1e-10)


def test_config3_limb_vs_oracle():
    atm, ll, reg, dl, nu = _scene()
    t_vib, T_lay = _tvib_profiles(reg, atm)
    nlte = device_nlte(reg, t_vib, dtype=jnp.float64)
    h_t = np.array([40e3, 70e3])
    cg = limb_path_cg(atm, SPECIES_NAMES, jnp.asarray(h_t), MARS, n_sub=4)
    got = np.asarray(_jit_limb(jnp.asarray(nu), dl, cg, nlte,
                               variant="weideman", cutoff_cm1=25.0))

    e_lvl = np.asarray(reg.energies_cm1)

    def q_ratio_fn(name, T):
        return np.full(len(ll), tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T))

    def nlte_weights_fn(name, lay, T_kin):
        r = np.exp(-C2 * e_lvl * (1 / t_vib[:, lay] - 1 / T_kin))
        r_u = np.where(ll.level_upper >= 0, r[np.maximum(ll.level_upper, 0)], 1.0)
        r_l = np.where(ll.level_lower >= 0, r[np.maximum(ll.level_lower, 0)], 1.0)
        E = np.exp(-C2 * ll.nu0 / T_kin)
        return (r_l - r_u * E) / (1 - E), r_u

    for r_i, ht in enumerate(h_t):
        ref = numpy_ref.limb_radiance(
            nu, {"CO2": ll}, np.asarray(atm.z), np.asarray(atm.p),
            np.asarray(atm.T), np.asarray(atm.n),
            {k: np.asarray(v) for k, v in atm.vmr.items()},
            MARS.radius_m, ht, SPECIES_NAMES, q_ratio_fn, cutoff=25.0,
            n_sub=4, nlte_weights_fn=nlte_weights_fn)
        np.testing.assert_allclose(got[r_i], ref, rtol=3e-4,
                                   atol=ref.max() * 1e-7, err_msg=f"ray {r_i}")


def test_nlte_enhances_high_limb_emission():
    atm, ll, reg, dl, nu = _scene()
    t_vib, T_lay = _tvib_profiles(reg, atm)
    nlte = device_nlte(reg, t_vib, dtype=jnp.float64)
    nlte_lte = device_nlte(reg, lte_t_vib(reg, T_lay), dtype=jnp.float64)
    cg = limb_path_cg(atm, SPECIES_NAMES, jnp.asarray([75e3]), MARS)
    nuj = jnp.asarray(nu)
    hot = np.asarray(_jit_limb(nuj, dl, cg, nlte))
    cold = np.asarray(_jit_limb(nuj, dl, cg, nlte_lte))
    assert hot.sum() > 1.5 * cold.sum()  # pumped nu3 -> much brighter limb
    # ("cold" is NOT compared to the no-nlte path: T_vib profiles are built
    # at layer-mid kinetic T while weights use per-(ray,layer) CG T_air, and
    # at 4.3 um r is exponentially sensitive, ~exp(c2 E dT / T^2) ~ 16%/K.)
    none = np.asarray(_jit_limb(nuj, dl, cg, None))
    # Exact LTE identity: zero-energy levels force r_u = r_l = 1 exactly.
    from spectrobot_tpu.data.nlte import DeviceNLTE
    nlte_zero = DeviceNLTE(e_level=jnp.zeros_like(nlte.e_level),
                           t_vib=nlte.t_vib)
    zero = np.asarray(_jit_limb(nuj, dl, cg, nlte_zero))
    np.testing.assert_allclose(zero, none, rtol=1e-12)
