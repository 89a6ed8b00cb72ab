"""RT integrator (C13) vs sequential oracle + analytic cases."""

import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.forward.rt import radiance_along_ray, transmittance


def test_matches_sequential_oracle():
    rng = np.random.default_rng(3)
    dtau = rng.uniform(0.0, 1.5, (12, 64))
    src = rng.uniform(0.0, 2.0, (12, 64))
    bg = rng.uniform(0.0, 1.0, 64)
    ref = numpy_ref.radiance_along_ray(dtau, src, bg)
    got = radiance_along_ray(jnp.asarray(dtau), jnp.asarray(src), jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12)


def test_isothermal_opaque_is_source():
    # Very thick isothermal path -> I = S (blackbody limit).
    dtau = jnp.full((20, 8), 10.0)
    src = jnp.full((20, 8), 3.14)
    got = radiance_along_ray(dtau, src)
    np.testing.assert_allclose(np.asarray(got), 3.14, rtol=1e-10)


def test_transparent_passes_background():
    dtau = jnp.zeros((5, 8))
    src = jnp.ones((5, 8))
    bg = jnp.full(8, 7.0)
    got = radiance_along_ray(dtau, src, bg)
    np.testing.assert_allclose(np.asarray(got), 7.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(transmittance(dtau)), 1.0)


def test_batched_rays():
    rng = np.random.default_rng(4)
    dtau = rng.uniform(0, 1, (3, 7, 16))   # [ray, seg, nu]
    src = rng.uniform(0, 1, (3, 7, 16))
    got = np.asarray(radiance_along_ray(jnp.asarray(dtau), jnp.asarray(src)))
    for r in range(3):
        ref = numpy_ref.radiance_along_ray(dtau[r], src[r])
        np.testing.assert_allclose(got[r], ref, rtol=1e-12)


def test_nadir_kirchhoff_isothermal():
    # Isothermal atmosphere + surface at T0: nadir radiance must equal
    # B(T0) for ANY surface emissivity (reflection completes the cavity).
    import jax
    from spectrobot_tpu.constants import K_BOLTZ
    from spectrobot_tpu.data.atmosphere import Atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band
    from spectrobot_tpu.forward.geometry import nadir_path_cg
    from spectrobot_tpu.forward.limb import nadir_radiance
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    T0 = 230.0
    n_lev = 7
    z = np.linspace(0, 50e3, n_lev)
    n = 2e23 * np.exp(-z / 11e3)
    atm = Atmosphere(z=jnp.asarray(z), p=jnp.asarray(n * K_BOLTZ * T0),
                     T=jnp.asarray(np.full(n_lev, T0)), n=jnp.asarray(n),
                     vmr={"CO2": jnp.asarray(np.full(n_lev, 0.95))})
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(660.0, 674.0, 200))
    cg = nadir_path_cg(atm, ["CO2"], jnp.asarray([1.0]), n_sub=2)
    from golden import numpy_ref
    B = numpy_ref.planck(np.asarray(nu), T0)
    for eps in (1.0, 0.7, 0.3):
        I = np.asarray(jax.jit(lambda e: nadir_radiance(
            nu, dl, cg, T0, emissivity=e, chunk=64))(eps))
        np.testing.assert_allclose(I[0], B, rtol=1e-8,
                                   err_msg=f"emissivity {eps}")


def test_reflection_darkens_cold_sky_windows():
    # Non-isothermal case: with a cold sky, lower emissivity lowers the
    # window-region radiance (less surface emission, weak sky reflection).
    import jax
    from spectrobot_tpu.data.atmosphere import mars_standard_atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band
    from spectrobot_tpu.forward.geometry import nadir_path_cg
    from spectrobot_tpu.forward.limb import nadir_radiance
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    atm = mars_standard_atmosphere(n_lev=7, z_top=60e3)
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(650.0, 674.0, 300))
    cg = nadir_path_cg(atm, ["CO2"], jnp.asarray([1.0]), n_sub=2)
    f = jax.jit(lambda e: nadir_radiance(nu, dl, cg, 260.0, emissivity=e,
                                         chunk=64))
    I_black = np.asarray(f(1.0))
    I_grey = np.asarray(f(0.6))
    window = np.asarray(nu) < 656.0   # outside the synthetic band: clear sky
    # ~11% darkening observed (wing opacity + sky reflection partly
    # refill the window); assert the direction with margin.
    assert I_grey[0, window].mean() < 0.95 * I_black[0, window].mean()
