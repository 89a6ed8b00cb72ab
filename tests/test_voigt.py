"""Voigt kernel math vs scipy.special.wofz (SURVEY.md test strategy 5.1)."""

import functools

import jax
import numpy as np
import pytest
from scipy.special import wofz as scipy_wofz

from spectrobot_tpu.ops.voigt import (
    voigt_profile, wofz_humlicek4, wofz_weideman,
)

# jit everything so the persistent compilation cache makes reruns cheap on
# this 2-core CPU image (eager per-op dispatch costs ~0.4 s/op here).
_weid = jax.jit(functools.partial(wofz_weideman, n_terms=32))
_hum = jax.jit(wofz_humlicek4)
_vp = jax.jit(voigt_profile, static_argnames=("variant",))


def _xy_plane():
    x = np.concatenate([np.linspace(0.0, 40.0, 241),
                        10.0 ** np.linspace(-3, 1.5, 60)])
    y = 10.0 ** np.linspace(-6, 3, 80)
    X, Y = np.meshgrid(x, y)
    return X, Y


def test_weideman_matches_wofz_f64():
    X, Y = _xy_plane()
    ref = scipy_wofz(X + 1j * Y)
    wr, wi = _weid(X, Y)
    np.testing.assert_allclose(np.asarray(wr), ref.real, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(wi), ref.imag, rtol=1e-6, atol=1e-12)


def test_humlicek4_region_boundaries():
    # Dense sampling across the s=15, s=5.5 and region III/IV boundaries.
    X, Y = _xy_plane()
    ref = scipy_wofz(X + 1j * Y).real
    wr, _ = _hum(X, Y)
    rel = np.abs(np.asarray(wr) - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel.max() < 1e-3, rel.max()


def test_humlicek4_f32_wing_accuracy():
    # The f32 hot path must keep RELATIVE accuracy in deep wings (no
    # catastrophic cancellation) — the property that justifies using it in
    # the Pallas kernel (SURVEY.md 8.4 hard part 1).
    X, Y = _xy_plane()
    ref = scipy_wofz(X + 1j * Y).real
    wr, _ = _hum(np.float32(X), np.float32(Y))
    rel = np.abs(np.asarray(wr, dtype=np.float64) - ref) / np.maximum(ref, 1e-300)
    assert rel[ref > 1e-12].max() < 5e-4


@pytest.mark.parametrize("variant", ["weideman", "humlicek4"])
def test_voigt_profile_normalisation(variant):
    # Integral of the area-normalised profile over a wide grid ~ 1.
    nu = np.linspace(-400.0, 400.0, 200001)
    v = np.asarray(_vp(nu, 0.01, 0.5, variant=variant))
    integral = np.trapezoid(v, nu)
    assert abs(integral - 1.0) < 2e-3  # Lorentzian tails carry ~0.08% beyond


def test_voigt_profile_limits():
    # Pure-Doppler limit -> Gaussian; pressure-dominated -> Lorentzian.
    nu = np.linspace(-1.0, 1.0, 2001)
    ad = 0.05
    gl_tiny = 1e-9
    v = np.asarray(_vp(nu, ad, gl_tiny, variant="weideman"))
    gauss = np.sqrt(np.log(2) / np.pi) / ad * np.exp(-np.log(2) * (nu / ad) ** 2)
    # The residual Lorentzian tail ~ gl/(pi dnu^2) bounds the agreement.
    tail = gl_tiny / np.pi / np.maximum(nu ** 2, ad ** 2)
    np.testing.assert_allclose(v, gauss, rtol=1e-5, atol=float(tail.max()) * 1.5)
    gl = 0.3
    v = np.asarray(_vp(nu, 1e-5, gl, variant="weideman"))
    lor = gl / np.pi / (nu ** 2 + gl ** 2)
    np.testing.assert_allclose(v, lor, rtol=1e-4)
