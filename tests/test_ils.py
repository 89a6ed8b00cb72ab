"""Instrument line-shape convolution (C14)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.ops.ils import apply_ils, ils_matrix


@pytest.mark.parametrize("shape", ["gaussian", "triangle", "sinc", "sinc2"])
def test_flat_spectrum_stays_flat(shape):
    nu = np.linspace(600.0, 700.0, 5001)
    chans = np.linspace(610.0, 690.0, 41)
    W = ils_matrix(nu, chans, fwhm=0.5, shape=shape)
    out = np.asarray(apply_ils(jnp.full(nu.shape, 2.5), jnp.asarray(W)))
    np.testing.assert_allclose(out, 2.5, rtol=1e-10)


def test_delta_maps_to_ils_shape():
    nu = np.linspace(-5.0, 5.0, 2001)
    W = ils_matrix(nu + 650.0, np.array([650.0]), fwhm=1.0, shape="gaussian")
    spec = np.zeros_like(nu)
    i0 = 1000  # delta at channel center
    spec[i0] = 1.0
    out = float(np.asarray(apply_ils(jnp.asarray(spec), jnp.asarray(W)))[0])
    # Response = W[0, i0]: the ILS peak weight.
    assert out == pytest.approx(W[0, i0])
    assert W[0, i0] == W[0].max()


def test_batched_application():
    nu = np.linspace(600.0, 700.0, 1001)
    chans = np.linspace(620.0, 680.0, 13)
    W = jnp.asarray(ils_matrix(nu, chans, fwhm=1.0))
    spectra = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 5, 1001)))
    out = np.asarray(apply_ils(spectra, W))
    assert out.shape == (4, 5, 13)
    one = np.asarray(apply_ils(spectra[2, 3], W))
    np.testing.assert_allclose(out[2, 3], one, rtol=1e-12)


def test_smoothing_reduces_variance():
    nu = np.linspace(600.0, 700.0, 5001)
    chans = np.linspace(620.0, 680.0, 601)
    W = ils_matrix(nu, chans, fwhm=2.0)
    rng = np.random.default_rng(1)
    spec = 1.0 + 0.5 * rng.standard_normal(nu.shape)
    out = np.asarray(apply_ils(jnp.asarray(spec), jnp.asarray(W)))
    assert out.std() < 0.1 * spec.std()


def test_fov_smearing_over_tangent_heights():
    from spectrobot_tpu.ops.ils import apply_fov, fov_matrix
    h_fine = np.linspace(5e3, 60e3, 111)
    h_obs = np.array([15e3, 30e3, 45e3])
    V = fov_matrix(h_fine, h_obs, fwhm_m=3e3)
    # Flat radiance ladder stays flat; smooth gradient averages locally.
    I = jnp.asarray(np.outer(np.linspace(1.0, 0.1, 111), np.ones(17)))
    out = np.asarray(apply_fov(I, jnp.asarray(V)))
    assert out.shape == (3, 17)
    expect = np.interp(h_obs, h_fine, np.linspace(1.0, 0.1, 111))
    np.testing.assert_allclose(out[:, 0], expect, rtol=5e-3)


def test_fov_in_forward_builder():
    import jax
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.data.synth import co2_15um_band
    from spectrobot_tpu.ops.ils import fov_matrix
    from spectrobot_tpu.ops.strengths import device_lines_from_linelist
    from spectrobot_tpu.retrieval.state import (
        build_forward, flatten_state, make_state,
    )

    atm = mars_standard_atmosphere(n_lev=7, z_top=60e3)
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(660.0, 672.0, 150))
    h_fine = np.linspace(8e3, 50e3, 15)
    h_obs = np.array([15e3, 35e3])
    V = jnp.asarray(fov_matrix(h_fine, h_obs, fwhm_m=6e3))
    fwd = build_forward(atm, dl, nu, ["CO2"], MARS,
                        tangent_heights_m=jnp.asarray(h_fine), fov_V=V,
                        n_sub=2)
    x0, unr = flatten_state(make_state(atm, []))
    y = np.asarray(jax.jit(lambda x: fwd(unr(x)))(x0))
    assert y.shape == (2 * 150,)
    # FOV-smeared values sit within the fine-ladder envelope.
    fwd_fine = build_forward(atm, dl, nu, ["CO2"], MARS,
                             tangent_heights_m=jnp.asarray(h_fine), n_sub=2)
    yf = np.asarray(jax.jit(lambda x: fwd_fine(unr(x)))(x0)).reshape(15, 150)
    ys = y.reshape(2, 150)
    assert np.all(ys <= yf.max(axis=0) + 1e-12)
    assert np.all(ys >= yf.min(axis=0) - 1e-12)


def test_sinc_ils_fwhm_and_lobes():
    """The unapodised FTS sinc ILS: correct FWHM calibration and REAL
    negative side lobes (what distinguishes it from sinc^2)."""
    import numpy as np
    from spectrobot_tpu.ops.ils import _sinc

    fwhm = 0.5
    dx = np.linspace(-3.0, 3.0, 4001)
    r = _sinc(dx, fwhm)
    assert abs(r[2000] - 1.0) < 1e-12
    # Half-maximum crossing at +-fwhm/2.
    half = dx[2000:][np.argmin(np.abs(r[2000:] - 0.5))]
    assert abs(half - fwhm / 2) < 0.01
    assert r.min() < -0.05          # negative first side lobe
