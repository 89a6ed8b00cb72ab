"""Randomised-scene robustness sweep (round 4).

The acceptance configs pin five curated scenes; this sweep drives the full
forward + Jacobian through RANDOM scenes — random line statistics, species
subsets, grid windows, tangent ladders, and temperature perturbations —
asserting the numerical hardening invariants that hold for ANY physical
input: finite non-negative radiances, finite Jacobians, and engine
agreement.  Seeded (deterministic), small shapes (CPU suite budget).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import random_lines
from spectrobot_tpu.forward.geometry import limb_path_cg, nadir_path_cg
from spectrobot_tpu.forward.limb import limb_radiance, nadir_radiance
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.retrieval.state import (
    build_forward, flatten_state, jacobian_fwd_chunked, make_state)


def _random_scene(seed):
    rng = np.random.default_rng(seed)
    nu_lo = float(rng.uniform(300.0, 2400.0))
    span = float(rng.uniform(8.0, 60.0))
    n_lines = int(rng.integers(20, 300))
    ll = random_lines(n_lines, nu_lo, nu_lo + span, seed=seed + 1)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    n_lev = int(rng.integers(5, 12))
    atm = mars_standard_atmosphere(n_lev=n_lev,
                                  z_top=float(rng.uniform(40e3, 90e3)))
    # Random (bounded) temperature perturbation — stays inside the Q(T)
    # table range.
    dT = rng.uniform(-25.0, 25.0, size=n_lev)
    atm = atm.with_temperature(atm.T + jnp.asarray(dT, atm.T.dtype))
    P = int(rng.integers(96, 257))
    nu = jnp.asarray(np.linspace(nu_lo + 1.0, nu_lo + span - 1.0, P))
    return rng, atm, dl, nu


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_limb_scene_forward_and_jacobian(seed):
    rng, atm, dl, nu = _random_scene(seed)
    n_rays = int(rng.integers(2, 5))
    h_t = jnp.asarray(np.sort(rng.uniform(4e3, 0.8 * float(atm.z[-1]),
                                          n_rays)))
    cg = limb_path_cg(atm, ["CO2"], h_t, MARS, n_sub=2)
    I = jax.jit(lambda: limb_radiance(nu, dl, cg, chunk=64))()
    I = np.asarray(I)
    assert np.isfinite(I).all(), (seed, "limb radiance not finite")
    assert (I >= 0).all(), (seed, "negative limb radiance")

    fwd = build_forward(atm, dl, nu, ["CO2"], MARS, tangent_heights_m=h_t,
                        n_sub=2, chunk=64)
    x0, unravel = flatten_state(make_state(atm, retrieve_vmr=[]))
    K = np.asarray(jacobian_fwd_chunked(lambda x: fwd(unravel(x)), x0,
                                        chunk=8))
    assert np.isfinite(K).all(), (seed, "Jacobian not finite")
    assert np.abs(K).max() > 0, (seed, "identically zero Jacobian")


@pytest.mark.parametrize("seed", [5, 91])
def test_random_nadir_scene_kirchhoff_bound(seed):
    """Random nadir scenes: finite, positive, and bounded by the warmest
    Planck curve in the scene (no emissivity>1-style energy creation)."""
    from spectrobot_tpu.ops.planck import planck_nu

    rng, atm, dl, nu = _random_scene(seed)
    sec = jnp.asarray(np.sort(rng.uniform(1.0, 2.5, 2)))
    cg = nadir_path_cg(atm, ["CO2"], sec, n_sub=2)
    Ts = float(rng.uniform(180.0, 290.0))
    emis = float(rng.uniform(0.7, 1.0))
    I = np.asarray(jax.jit(lambda: nadir_radiance(
        nu, dl, cg, Ts, emissivity=emis, chunk=64))())
    assert np.isfinite(I).all() and (I >= 0).all(), seed
    T_hot = max(Ts, float(np.asarray(atm.T).max()))
    B_hot = np.asarray(planck_nu(nu, T_hot))
    assert (I <= B_hot[None, :] * (1.0 + 1e-6)).all(), (
        seed, "radiance exceeds the hottest Planck curve in the scene")


@pytest.mark.parametrize("seed", [7])
def test_random_scene_engine_agreement(seed):
    """jnp vs pallas(interpret) engines agree on a random scene — with
    the chi wing correction randomly enabled (odd seeds), so the fuzz
    sweep also exercises the chi kernels' invariants."""
    rng, atm, dl, nu = _random_scene(seed)
    dl32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if a.dtype in (jnp.float64,) else a, dl)
    nu32 = nu.astype(jnp.float32)
    h_t = jnp.asarray([8e3, 22e3], jnp.float32)
    cg = limb_path_cg(atm, ["CO2"], h_t, MARS, n_sub=2)
    cg32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, cg)
    chi = None
    if seed % 2:
        from spectrobot_tpu.ops.chi import CHI_PROFILES
        chi = (CHI_PROFILES["co2_mars"], (True,))
    I_jnp = np.asarray(jax.jit(lambda: limb_radiance(
        nu32, dl32, cg32, chunk=64, chi=chi))())
    I_pal = np.asarray(jax.jit(lambda: limb_radiance(
        nu32, dl32, cg32, chunk=64, engine="pallas", interpret=True,
        chi=chi))())
    assert np.isfinite(I_jnp).all() and (I_jnp >= 0).all()
    np.testing.assert_allclose(I_pal, I_jnp, rtol=5e-5,
                               atol=np.abs(I_jnp).max() * 1e-5)
