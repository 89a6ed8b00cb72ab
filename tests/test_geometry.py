"""Limb/nadir geometry and Curtis-Godson averaging (C11/C12) vs closed forms
and the independent oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.constants import K_BOLTZ
from spectrobot_tpu.data.atmosphere import MARS, Atmosphere
from spectrobot_tpu.forward.geometry import limb_path_cg, nadir_path_cg

SPECIES = ["CO2"]


def _uniform_atm(n_lev=21, z_top=50e3, n0=1e23, T0=180.0):
    """Constant-density, isothermal atmosphere for analytic checks."""
    z = np.linspace(0, z_top, n_lev)
    n = np.full(n_lev, n0)
    p = n * K_BOLTZ * T0
    return Atmosphere(z=jnp.asarray(z), p=jnp.asarray(p),
                      T=jnp.asarray(np.full(n_lev, T0)), n=jnp.asarray(n),
                      vmr={"CO2": jnp.asarray(np.full(n_lev, 1.0))})


def test_limb_column_analytic():
    # Constant density: one-side column through all shells above tangent
    # = n0 * sqrt(r_top^2 - r_t^2).
    atm = _uniform_atm()
    h_t = 12.5e3
    cg = limb_path_cg(atm, SPECIES, jnp.asarray([h_t]), MARS, n_sub=16)
    r_top = MARS.radius_m + 50e3
    r_t = MARS.radius_m + h_t
    expect = 1e23 * np.sqrt(r_top ** 2 - r_t ** 2)
    got = float(jnp.sum(cg.u[0, :, 0]))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_limb_layers_below_tangent_empty():
    atm = _uniform_atm()
    cg = limb_path_cg(atm, SPECIES, jnp.asarray([26e3]), MARS)
    z = np.asarray(atm.z)
    u = np.asarray(cg.u[0, :, 0])
    below = z[1:] <= 26e3  # layers entirely below the tangent height
    assert np.all(u[below] == 0.0)
    assert np.all(u[~below] > 0.0)


def test_nadir_column_analytic():
    atm = _uniform_atm()
    cg = nadir_path_cg(atm, SPECIES, jnp.asarray([1.0, 2.0]))
    u = np.asarray(cg.u)
    np.testing.assert_allclose(u[0].sum(), 1e23 * 50e3, rtol=1e-10)
    np.testing.assert_allclose(u[1].sum(), 2e23 * 50e3, rtol=1e-10)
    assert cg.seg_count == atm.n_lev - 1
    # observer-first ordering: top layer first
    assert int(cg.seg_layer[0]) == atm.n_lev - 2


def test_limb_cg_matches_oracle(mars_atm):
    species = ["CO2", "CO"]
    h_t = 18e3
    cg = limb_path_cg(mars_atm, species, jnp.asarray([h_t]), MARS, n_sub=4)
    ref = numpy_ref.limb_layer_cg(
        np.asarray(mars_atm.z), np.asarray(mars_atm.p), np.asarray(mars_atm.T),
        np.asarray(mars_atm.n), {k: np.asarray(v) for k, v in mars_atm.vmr.items()},
        MARS.radius_m, h_t, species, n_sub=4)
    np.testing.assert_allclose(np.asarray(cg.u[0]), ref["u"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cg.T_sp[0]), ref["T"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cg.p_sp[0]), ref["p"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cg.p_self_sp[0]), ref["ps"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cg.T_air[0]), ref["T_air"], rtol=1e-10)


def test_limb_segment_order(mars_atm):
    cg = limb_path_cg(mars_atm, SPECIES, jnp.asarray([10e3]), MARS)
    n_lay = mars_atm.n_lev - 1
    seg = np.asarray(cg.seg_layer)
    assert cg.seg_count == 2 * n_lay
    assert seg[0] == n_lay - 1 and seg[n_lay - 1] == 0
    assert seg[n_lay] == 0 and seg[-1] == n_lay - 1


def test_cg_differentiable(mars_atm):
    # d(column)/d(T profile) must flow (retrieval needs it, C15/C16).
    def total_u(T):
        atm = mars_atm.with_temperature(T)
        cg = limb_path_cg(atm, SPECIES, jnp.asarray([15e3]), MARS)
        return jnp.sum(cg.u)

    g = jax.grad(total_u)(mars_atm.T)
    assert np.isfinite(np.asarray(g)).all()
    assert np.any(np.asarray(g) != 0)
