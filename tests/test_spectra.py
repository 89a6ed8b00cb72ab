"""Spectral-object family (SURVEY.md 1.2 ``SpectralObject``): arithmetic,
conversions, ILS convolution, pytree/jit composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.ops.planck import planck_nu
from spectrobot_tpu.spectra import (
    Spectrum, optical_depth, radiance, transmittance,
)


def _grid(P=128):
    return jnp.asarray(np.linspace(600.0, 700.0, P))


def test_arithmetic_and_kinds():
    nu = _grid()
    a = radiance(nu, jnp.ones((3, nu.shape[0])) * 2.0)
    b = radiance(nu, jnp.ones((3, nu.shape[0])))
    c = a + b
    assert c.kind == "radiance"
    np.testing.assert_allclose(np.asarray(c.values), 3.0)
    d = a * 0.5 - 1.0
    np.testing.assert_allclose(np.asarray(d.values), 0.0)
    # mixed kinds decay to generic
    e = a + optical_depth(nu, jnp.ones((3, nu.shape[0])))
    assert e.kind == "generic"
    # grid mismatch is an error
    with pytest.raises(ValueError, match="grids differ"):
        a + radiance(_grid(64), jnp.ones((3, 64)))


def test_conversions_roundtrip():
    nu = _grid()
    tau = optical_depth(nu, jnp.linspace(0.0, 5.0, nu.shape[0]))
    t = tau.to_transmittance()
    assert t.kind == "transmittance"
    assert float(t.values.min()) > 0.0 and float(t.values.max()) <= 1.0
    back = t.to_optical_depth()
    np.testing.assert_allclose(np.asarray(back.values),
                               np.asarray(tau.values), rtol=1e-12)
    with pytest.raises(ValueError):
        t.to_transmittance()


def test_brightness_temperature_inverts_planck():
    nu = _grid()
    T = 215.0
    I = radiance(nu, planck_nu(nu, T))
    tb = I.brightness_temperature()
    assert tb.kind == "brightness_temperature"
    np.testing.assert_allclose(np.asarray(tb.values), T, rtol=1e-10)
    # zero/negative radiance maps to 0 K, not NaN
    z = radiance(nu, jnp.zeros_like(nu)).brightness_temperature()
    assert np.all(np.asarray(z.values) == 0.0)


def test_integrate_matches_numpy_trapezoid():
    nu = _grid()
    v = jnp.sin(nu / 30.0) ** 2
    s = Spectrum(nu, v)
    np.testing.assert_allclose(float(s.integrate()),
                               np.trapezoid(np.asarray(v), np.asarray(nu)),
                               rtol=1e-12)


def test_interp_and_slice():
    nu = _grid(256)
    s = radiance(nu, jnp.stack([nu * 0 + 1.0, nu]))
    nu2 = jnp.asarray(np.linspace(610.0, 690.0, 57))
    r = s.interp_to(nu2)
    assert r.kind == "radiance" and r.values.shape == (2, 57)
    np.testing.assert_allclose(np.asarray(r.values[1]), np.asarray(nu2),
                               rtol=1e-12)
    sl = s[10:20]
    assert sl.n_points == 10 and sl.values.shape == (2, 10)


def test_convolve_ils_flat_preserved():
    nu = _grid(512)
    s = radiance(nu, jnp.full((4, 512), 2.5))
    chans = np.linspace(620.0, 680.0, 31)
    out = s.convolve_ils(chans, fwhm=1.0)
    assert out.values.shape == (4, 31)
    np.testing.assert_allclose(np.asarray(out.values), 2.5, rtol=1e-6)


def test_pytree_jit_grad_composition():
    nu = _grid()

    @jax.jit
    def band(s: Spectrum):
        return s.to_transmittance().integrate()

    tau0 = jnp.linspace(0.1, 2.0, nu.shape[0])
    s = optical_depth(nu, tau0)
    val = band(s)
    assert np.isfinite(float(val))
    # kind survives the pytree roundtrip under jit
    roundtrip = jax.jit(lambda sp: sp)(s)
    assert roundtrip.kind == "optical_depth"
    # grad through the object API
    g = jax.grad(lambda v: float(0.0) + band(optical_depth(nu, v)))(tau0)
    expect = -np.exp(-np.asarray(tau0)) * np.gradient(np.asarray(nu)).clip(0)
    assert np.all(np.asarray(g) < 0.0)  # more opacity -> less transmission
    assert g.shape == tau0.shape


def test_forward_model_returns_wrap():
    # The library API composes: wrap a limb radiance result and channelise.
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.forward.limb import limb_radiance
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist

    atm = mars_standard_atmosphere(n_lev=8, z_top=60e3)
    dl = device_lines_from_linelist(co2_15um_band(j_max=6), [(2, 1)],
                                    dtype=jnp.float64, nu_ref=0.0)
    nu = jnp.asarray(np.linspace(664.0, 670.0, 128))
    cg = limb_path_cg(atm, ["CO2"], jnp.asarray([15e3, 30e3]), MARS, 2)
    I = radiance(nu, limb_radiance(nu, dl, cg))
    tb = I.brightness_temperature()
    assert float(tb.values.max()) < float(atm.T.max()) + 1.0
    chan = I.convolve_ils(np.linspace(665.0, 669.0, 9), fwhm=0.3)
    assert chan.values.shape == (2, 9)
    assert np.isfinite(np.asarray(chan.values)).all()
