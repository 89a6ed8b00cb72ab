"""Acceptance config 1 (BASELINE.json:7): single-species CO2 15 um LTE nadir
spectrum, one atmospheric layer, coarse grid — framework vs the independent
CPU oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.data import tips
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.forward.model import nadir_single_layer as _nadir_raw

nadir_single_layer = jax.jit(
    _nadir_raw, static_argnames=("variant", "cutoff_cm1", "chunk"))
from spectrobot_tpu.ops.strengths import device_lines_from_linelist

SPECIES = [(2, 1)]


def _scene():
    ll = co2_15um_band(j_max=30)
    dl = device_lines_from_linelist(ll, SPECIES, dtype=jnp.float64)
    nu = np.linspace(630.0, 705.0, 3001)  # 0.025 cm-1 coarse grid
    scene = dict(T_layer=215.0, p_layer_pa=500.0, column_m2=2.0e27,
                 vmr_self=0.95, T_surface=260.0)
    return ll, dl, nu, scene


def test_config1_allclose_to_oracle():
    ll, dl, nu, sc = _scene()
    T = sc["T_layer"]
    q_ratio = np.full(len(ll), tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T))
    golden = numpy_ref.nadir_single_layer(
        nu, ll, T, sc["p_layer_pa"], sc["column_m2"], sc["vmr_self"],
        sc["T_surface"], q_ratio, cutoff=25.0)
    got = nadir_single_layer(jnp.asarray(nu), dl, T, sc["p_layer_pa"],
                             sc["column_m2"], sc["vmr_self"], sc["T_surface"],
                             variant="weideman", cutoff_cm1=25.0)
    np.testing.assert_allclose(np.asarray(got), golden, rtol=5e-4)


def test_config1_f32_hot_path_close():
    ll, dl, nu, sc = _scene()
    T = sc["T_layer"]
    q_ratio = np.full(len(ll), tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T))
    golden = numpy_ref.nadir_single_layer(
        nu, ll, T, sc["p_layer_pa"], sc["column_m2"], sc["vmr_self"],
        sc["T_surface"], q_ratio, cutoff=25.0)
    dl32 = device_lines_from_linelist(co2_15um_band(j_max=30), SPECIES,
                                      dtype=jnp.float32)
    got = nadir_single_layer(jnp.asarray(nu, dtype=jnp.float32), dl32, T,
                             sc["p_layer_pa"], sc["column_m2"], sc["vmr_self"],
                             sc["T_surface"], variant="humlicek4",
                             cutoff_cm1=25.0)
    # f32 + Humlicek accuracy budget: radiances to ~1e-3 relative.
    np.testing.assert_allclose(np.asarray(got, dtype=np.float64), golden,
                               rtol=5e-3, atol=golden.max() * 1e-4)


def test_config1_physics_sanity():
    ll, dl, nu, sc = _scene()
    got = np.asarray(nadir_single_layer(
        jnp.asarray(nu), dl, sc["T_layer"], sc["p_layer_pa"], sc["column_m2"],
        sc["vmr_self"], sc["T_surface"]))
    # Between the surface Planck (optically thin) and layer Planck (thick):
    b_surf = numpy_ref.planck(nu, sc["T_surface"])
    b_lay = numpy_ref.planck(nu, sc["T_layer"])
    assert np.all(got <= b_surf * (1 + 1e-9))
    assert np.all(got >= np.minimum(b_lay, b_surf) * (1 - 1e-9))
    # Line cores are absorption features (colder layer over warmer surface).
    assert got.min() < 0.98 * b_surf.min()
