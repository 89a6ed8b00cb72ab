"""Non-LTE LUT tier (C9, reference ``makeLUT*`` per-level tables,
SURVEY.md 4.3): per-level-group coefficient tables vs the direct
line-sum/weights path of data/nlte.py."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.nlte import (
    device_nlte, lte_t_vib, match_lines_to_levels, registry_from_linelist,
    weights_for_layer,
)
from spectrobot_tpu.data.synth import co2_43um_band, co2_43um_hot_band
from spectrobot_tpu.forward.geometry import limb_path_cg
from spectrobot_tpu.forward.limb import (
    layer_tau, optics_from_tau, path_radiance,
)
from spectrobot_tpu.ops.lut import (
    build_nlte_lut, layer_tau_nlte_lut, load_nlte_lut, nlte_group_ratios,
    save_nlte_lut, _bilinear_tq,
)
from spectrobot_tpu.ops.opacity import cross_sections
from spectrobot_tpu.ops.strengths import device_lines_from_linelist

SPECIES_PAIRS = [(2, 1)]
SPECIES_NAMES = ["CO2"]


def _scene():
    atm = mars_standard_atmosphere(n_lev=16, z_top=90e3)
    ll = co2_43um_band(j_max=15).concat(co2_43um_hot_band(j_max=10))
    reg = registry_from_linelist(ll)
    ll = match_lines_to_levels(ll, reg)
    dl = device_lines_from_linelist(ll, SPECIES_PAIRS, dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(2320.0, 2360.0, 801))
    return atm, ll, reg, dl, nu


def _tvib(reg, atm):
    z_lev = np.asarray(atm.z)
    z_mid = 0.5 * (z_lev[1:] + z_lev[:-1])
    T_lay = np.interp(z_mid, z_lev, np.asarray(atm.T))
    t_vib = lte_t_vib(reg, T_lay)
    boost = 1.0 + 0.35 * np.clip((z_mid - 50e3) / 40e3, 0.0, 1.0)
    for i, (m, iso, q) in enumerate(reg.keys):
        if q in ("0001", "0111"):
            t_vib[i] = T_lay * boost
    return t_vib, T_lay


def _build(nu, dl, atm, **kw):
    T_arr = np.asarray(atm.T)
    return build_nlte_lut(
        nu, dl, n_species=1,
        T_min=float(T_arr.min()) - 20.0, T_max=float(T_arr.max()) + 40.0,
        n_T=13, p_min=1e-3, p_max=1.5e3, n_p=17,
        vmr_self=[0.95], chunk=128, **kw)


def test_group_maps():
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    # 1 species LTE group + 4 levels (0000, 0110, 0001, 0111).
    assert lut.n_groups == 1 + reg.n_levels == 5
    gl = np.asarray(lut.group_level)
    gs = np.asarray(lut.group_species)
    assert gl[0] == -1 and np.all(gl[1:] == np.arange(reg.n_levels))
    assert gs[0] == 0
    # Every level of this scene is used by some line -> species resolved.
    assert np.all(gs[1:] == 0)
    # All lines matched -> the LTE group's tables are identically zero.
    assert float(jnp.abs(lut.sigma_l[0]).max()) == 0.0
    assert float(jnp.abs(lut.sigma_e[0]).max()) == 0.0


def test_node_exact_decomposition():
    """At a lattice node the group decomposition reproduces the direct
    weighted line sum to roundoff (the algebra of the module docstring)."""
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    t_vib, T_lay = _tvib(reg, atm)
    nlte = device_nlte(reg, t_vib, dtype=jnp.float64)

    T0 = float(lut.T_grid[8])
    p0 = 10.0 ** float(lut.logp_grid[9])
    lay = len(T_lay) - 2    # an aloft layer with excited nu3 populations

    # Direct: per-line weights at T_kin = T0 (the table's E is at T0 too).
    w_abs, w_em = weights_for_layer(nlte, dl, lay, T0)
    k_abs, k_em = cross_sections(nu, dl, T0, p0, p_self_pa=0.95 * p0,
                                 w_abs=w_abs, w_em=w_em, chunk=128)

    r = nlte_group_ratios(lut, nlte, lay, T0)
    assert float(jnp.abs(r - 1.0).max()) > 1e-3   # genuinely non-LTE layer
    sl = _bilinear_tq(lut.sigma_l, lut.T_grid, lut.logp_grid, T0, p0)
    su = _bilinear_tq(lut.sigma_u, lut.T_grid, lut.logp_grid, T0, p0)
    se = _bilinear_tq(lut.sigma_e, lut.T_grid, lut.logp_grid, T0, p0)
    k_abs_tbl = jnp.einsum("g,gp->p", r, sl - su)
    k_em_tbl = jnp.einsum("g,gp->p", r, se)

    scale = float(jnp.max(jnp.abs(k_abs)))
    np.testing.assert_allclose(np.asarray(k_abs_tbl), np.asarray(k_abs),
                               atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(k_em_tbl), np.asarray(k_em),
                               atol=1e-9 * scale)


def test_lte_reduction_and_layer_tau(mars_atm):
    """nlte=None -> r = 1 -> the tier reduces to the plain LTE line sum
    (within bilinear interpolation error of the lattice)."""
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    cg = limb_path_cg(atm, SPECIES_NAMES, jnp.asarray([20e3, 60e3]), MARS,
                      n_sub=2)
    dtau, dtau_em = layer_tau_nlte_lut(lut, cg, None)
    dtau_d, dtau_em_d = layer_tau(nu, dl, cg, None, chunk=128)
    scale = float(np.asarray(dtau_d).max())
    assert np.max(np.abs(np.asarray(dtau) - np.asarray(dtau_d))) / scale < 0.03
    # In LTE the emission depth equals the absorption depth.
    np.testing.assert_allclose(np.asarray(dtau_em), np.asarray(dtau),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dtau_em_d), np.asarray(dtau_d),
                               rtol=1e-10)


def test_nlte_limb_radiance_vs_direct():
    """Full config-3-style limb radiance through the LUT tier vs the direct
    path: agreement to interpolation error, and genuinely non-LTE."""
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    t_vib, T_lay = _tvib(reg, atm)
    nlte = device_nlte(reg, t_vib, dtype=jnp.float64)
    h_t = jnp.asarray([40e3, 60e3, 75e3])
    cg = limb_path_cg(atm, SPECIES_NAMES, h_t, MARS, n_sub=2)

    dtau, dtau_em = layer_tau_nlte_lut(lut, cg, nlte)
    I_lut = path_radiance(optics_from_tau(nu, cg, dtau, dtau_em), cg, None)

    dtau_d, dtau_em_d = layer_tau(nu, dl, cg, nlte, chunk=128)
    I_dir = path_radiance(optics_from_tau(nu, cg, dtau_d, dtau_em_d), cg, None)

    # Non-LTE pumping must matter (vs the LTE radiance).
    dtau_l, dtau_em_l = layer_tau(nu, dl, cg, None, chunk=128)
    I_lte = path_radiance(optics_from_tau(nu, cg, dtau_l, dtau_em_l), cg, None)
    assert float(jnp.max(jnp.abs(I_dir - I_lte))) > 0.05 * float(jnp.max(I_lte))

    scale = float(jnp.max(I_dir))
    err = float(jnp.max(jnp.abs(I_lut - I_dir))) / scale
    assert err < 0.03, err


def test_differentiable_in_tvib_and_state():
    """Retrievals of T_vib against the cached tables: gradients flow
    through the group-ratio contraction."""
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    t_vib, T_lay = _tvib(reg, atm)
    cg = limb_path_cg(atm, SPECIES_NAMES, jnp.asarray([60e3]), MARS, n_sub=2)

    def loss(tv):
        nlte = device_nlte(reg, t_vib, dtype=jnp.float64)._replace(
            t_vib=tv)
        dtau, dtau_em = layer_tau_nlte_lut(lut, cg, nlte)
        I = path_radiance(optics_from_tau(nu, cg, dtau, dtau_em), cg, None)
        return jnp.sum(I)

    g = jax.grad(loss)(jnp.asarray(t_vib))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.max(np.abs(g)) > 0.0


def test_save_load_roundtrip(tmp_path):
    atm, ll, reg, dl, nu = _scene()
    lut = _build(nu, dl, atm)
    path = str(tmp_path / "nlte_lut.npz")
    save_nlte_lut(lut, path)
    lut2 = load_nlte_lut(path)
    for f in lut._fields:
        np.testing.assert_array_equal(np.asarray(getattr(lut, f)),
                                      np.asarray(getattr(lut2, f)))
