"""Atmosphere model (C10): hydrostatic balance, interpolation, pytree-ness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.constants import AMU, K_BOLTZ
from spectrobot_tpu.data.atmosphere import (
    MARS, hydrostatic_atmosphere, mars_standard_atmosphere,
)


def test_hydrostatic_balance(mars_atm):
    z = np.asarray(mars_atm.z)
    p = np.asarray(mars_atm.p)
    T = np.asarray(mars_atm.T)
    # dp/dz ~ -p mu g / (k T) at midpoints (2% tolerance for discretisation).
    dz = np.diff(z)
    dlnp = np.diff(np.log(p))
    zm = 0.5 * (z[1:] + z[:-1])
    Tm = 0.5 * (T[1:] + T[:-1])
    g = MARS.g0 * (MARS.radius_m / (MARS.radius_m + zm)) ** 2
    H = K_BOLTZ * Tm / (MARS.mu_amu * AMU * g)
    np.testing.assert_allclose(dlnp, -dz / H, rtol=2e-2)


def test_ideal_gas(mars_atm):
    np.testing.assert_allclose(
        np.asarray(mars_atm.n),
        np.asarray(mars_atm.p) / (K_BOLTZ * np.asarray(mars_atm.T)), rtol=1e-12)


def test_interp(mars_atm):
    zq = jnp.asarray([1234.5, 10_000.0, 55_555.0])
    Tq = np.asarray(mars_atm.interp_T(zq))
    assert np.all(Tq > 100) and np.all(Tq < 300)
    pq = np.asarray(mars_atm.interp_logp(zq))
    assert np.all(np.diff(pq) < 0)


def test_pytree_and_perturbation(mars_atm):
    leaves = jax.tree_util.tree_leaves(mars_atm)
    assert len(leaves) >= 4
    T2 = mars_atm.T + 5.0
    atm2 = mars_atm.with_temperature(T2)
    np.testing.assert_allclose(np.asarray(atm2.n),
                               np.asarray(atm2.p) / (K_BOLTZ * np.asarray(T2)),
                               rtol=1e-12)
    atm3 = mars_atm.with_vmr("CO", 2.0 * mars_atm.vmr["CO"])
    np.testing.assert_allclose(np.asarray(atm3.vmr["CO"]),
                               2 * np.asarray(mars_atm.vmr["CO"]))


def test_mars_surface_conditions():
    atm = mars_standard_atmosphere()
    assert 500 < float(atm.p[0]) <= 700
    assert 180 < float(atm.T[0]) < 240
    assert abs(float(atm.vmr["CO2"][0]) - 0.9532) < 1e-6


def test_titan_standard_atmosphere():
    from spectrobot_tpu.data.atmosphere import titan_standard_atmosphere
    atm = titan_standard_atmosphere(n_lev=31)
    p0 = float(atm.p[0])
    assert 1.3e5 < p0 < 1.6e5            # ~1.47 bar surface
    T = np.asarray(atm.T)
    assert 90 < T[0] < 100               # ~94 K surface
    assert T.min() < 75                  # tropopause minimum
    assert np.all(np.diff(np.asarray(atm.p)) < 0)
    assert abs(float(atm.vmr["N2"][0]) - 0.943) < 1e-6


def test_atmosphere_npz_round_trip(tmp_path, mars_atm):
    from spectrobot_tpu.data.atmosphere import Atmosphere
    p = str(tmp_path / "atm.npz")
    mars_atm.save_npz(p)
    a2 = Atmosphere.load_npz(p)
    np.testing.assert_allclose(np.asarray(a2.p), np.asarray(mars_atm.p))
    np.testing.assert_allclose(np.asarray(a2.vmr["CO2"]),
                               np.asarray(mars_atm.vmr["CO2"]))
