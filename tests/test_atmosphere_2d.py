"""2-D (lat x alt) atmosphere: the reference profile class's lat/alt
interpolation (spect_base_module, SURVEY.md 1.2) as a differentiable
pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.data.atmosphere import (
    Atmosphere2D, mars_standard_atmosphere, mars_zonal_atmosphere,
)


def test_node_exact_and_monotone():
    atm2 = mars_zonal_atmosphere(n_lat=7, n_lev=21, z_top=80e3)
    # Exactly at a grid latitude: the stored profile.
    k = 3   # equator row of the 7-point grid
    lat_k = float(atm2.lat_deg[k])
    a = atm2.at_lat(lat_k)
    np.testing.assert_allclose(np.asarray(a.T), np.asarray(atm2.T[k]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(atm2.p[k]),
                               rtol=1e-12)
    # Equator warmer than pole at the surface (the builder's physics).
    T_eq = float(atm2.at_lat(0.0).T[0])
    T_pole = float(atm2.at_lat(90.0).T[0])
    assert T_eq - T_pole > 20.0
    # Between nodes: bracketed by the neighbors.
    lat_q = 0.5 * (float(atm2.lat_deg[3]) + float(atm2.lat_deg[4]))
    T_mid = np.asarray(atm2.at_lat(lat_q).T)
    lo = np.minimum(np.asarray(atm2.T[3]), np.asarray(atm2.T[4]))
    hi = np.maximum(np.asarray(atm2.T[3]), np.asarray(atm2.T[4]))
    assert np.all(T_mid >= lo - 1e-9) and np.all(T_mid <= hi + 1e-9)
    # Clamped outside the grid.
    np.testing.assert_allclose(np.asarray(atm2.at_lat(120.0).T),
                               np.asarray(atm2.T[-1]), rtol=1e-12)


def test_logp_interpolation():
    """p interpolates in LOG space: the half-way profile is the geometric
    mean of the neighbors, not the arithmetic one."""
    atm2 = mars_zonal_atmosphere(n_lat=5, n_lev=11, z_top=60e3)
    lat_q = 0.5 * (float(atm2.lat_deg[1]) + float(atm2.lat_deg[2]))
    p_mid = np.asarray(atm2.at_lat(lat_q).p)
    geo = np.sqrt(np.asarray(atm2.p[1]) * np.asarray(atm2.p[2]))
    np.testing.assert_allclose(p_mid, geo, rtol=1e-12)


def test_differentiable_in_latitude():
    atm2 = mars_zonal_atmosphere(n_lat=7, n_lev=15, z_top=60e3)

    def f(lat):
        return jnp.sum(atm2.at_lat(lat).T)

    g = jax.grad(f)(25.0)
    assert np.isfinite(g) and abs(g) > 0.0


def test_from_profiles_and_roundtrip(tmp_path):
    a0 = mars_standard_atmosphere(n_lev=13, z_top=70e3)
    a1 = a0.with_temperature(a0.T - 15.0)
    atm2 = Atmosphere2D.from_profiles([-45.0, 45.0], [a0, a1])
    path = str(tmp_path / "atm2.npz")
    atm2.save_npz(path)
    back = Atmosphere2D.load_npz(path)
    for f in ("lat_deg", "z", "p", "T", "n"):
        np.testing.assert_array_equal(np.asarray(getattr(atm2, f)),
                                      np.asarray(getattr(back, f)))
    assert set(back.vmr) == set(atm2.vmr)
    np.testing.assert_array_equal(np.asarray(back.vmr["CO2"]),
                                  np.asarray(atm2.vmr["CO2"]))


def test_cli_2d_latitude_selection(tmp_path, capsys):
    """Driver end-to-end: the same scene at equator vs pole latitudes
    produces materially different limb radiances."""
    import json
    import os

    from spectrobot_tpu.cli import main

    for name, lat in (("eq", 0.0), ("po", 85.0)):
        cfg = tmp_path / f"{name}.toml"
        cfg.write_text(f"""
[grid]
nu_min = 660.0
nu_max = 674.0
n_points = 200
[scene]
atmosphere = "mars_zonal"
latitude_deg = {lat}
n_levels = 9
z_top_m = 60e3
[geometry]
tangent_heights_km = [15.0]
n_sub = 2
[compute]
dtype = "float64"
chunk = 128
[run]
output_dir = "{tmp_path}/{name}"
""")
        assert main(["forward", str(cfg)]) == 0
    capsys.readouterr()
    with np.load(os.path.join(str(tmp_path), "eq", "forward.npz")) as z:
        I_eq = z["radiance"]
    with np.load(os.path.join(str(tmp_path), "po", "forward.npz")) as z:
        I_po = z["radiance"]
    # Colder, thinner polar atmosphere -> dimmer 15 um limb.
    assert I_po.max() < 0.95 * I_eq.max()
