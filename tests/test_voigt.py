"""Voigt kernel math vs scipy.special.wofz (SURVEY.md test strategy 5.1)."""

import functools

import jax
import numpy as np
import pytest
from scipy.special import wofz as scipy_wofz

from spectrobot_tpu.ops.voigt import (
    voigt_profile, wofz_humlicek4, wofz_weideman, wofz_weideman_grad,
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


_weid_grad = jax.jit(wofz_weideman_grad)


def test_weideman_grad_matches_ad_f64():
    # The closed-form approximant derivative must equal AD through the same
    # approximant (it IS its derivative) to machine precision in f64.
    X, Y = _xy_plane()
    wr, wi, kx, ky = _weid_grad(X, Y)
    ref_wr, ref_wi = _weid(X, Y)
    np.testing.assert_allclose(np.asarray(wr), np.asarray(ref_wr), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(wi), np.asarray(ref_wi), rtol=1e-13)
    f = lambda x, y: wofz_weideman(x, y)[0]
    ad_kx = jax.jit(jax.vmap(jax.vmap(jax.grad(f, argnums=0))))(X, Y)
    ad_ky = jax.jit(jax.vmap(jax.vmap(jax.grad(f, argnums=1))))(X, Y)
    sx = np.abs(np.asarray(ad_kx)).max()
    sy = np.abs(np.asarray(ad_ky)).max()
    np.testing.assert_allclose(np.asarray(kx), np.asarray(ad_kx),
                               rtol=1e-10, atol=sx * 1e-13)
    np.testing.assert_allclose(np.asarray(ky), np.asarray(ad_ky),
                               rtol=1e-10, atol=sy * 1e-13)


def test_weideman_grad_f32_wing_stability():
    # THE property that makes the analytic opacity tangents usable in f32
    # (docs/ACCURACY.md): per-pair RELATIVE accuracy of the partials in deep
    # wings, where the exact identity w' = -2 z w + 2i/sqrt(pi) cancels
    # catastrophically.  Truth = f64 closed form.
    x = 10.0 ** np.linspace(0.0, 4.5, 120)
    y = 10.0 ** np.linspace(-4, 1, 40)
    X, Y = np.meshgrid(x, y)
    _, _, kx64, ky64 = _weid_grad(X, Y)
    _, _, kx32, ky32 = _weid_grad(np.float32(X), np.float32(Y))
    kx64, ky64 = np.asarray(kx64), np.asarray(ky64)
    relx = np.abs(np.asarray(kx32, np.float64) - kx64) / np.maximum(
        np.abs(kx64), 1e-300)
    rely = np.abs(np.asarray(ky32, np.float64) - ky64) / np.maximum(
        np.abs(ky64), 1e-300)
    # Error model (docs/ACCURACY.md): absolute f32 error of Kx is bounded by
    # ~1e-7 * (largest term in g) ~ 1e-7 / (pi x^2) — so components that are
    # SIGNIFICANT (> 1e-8, i.e. within 8 digits of the on-peak O(1) values)
    # are relative-accurate, and tinier ones have bounded absolute error.
    sig_x = np.abs(kx64) > 1e-8
    sig_y = np.abs(ky64) > 1e-8
    assert relx[sig_x].max() < 2e-2, relx[sig_x].max()
    assert rely[sig_y].max() < 5e-4, rely[sig_y].max()
    absx = np.abs(np.asarray(kx32, np.float64) - kx64)
    assert (absx * np.maximum(X, 1.0) ** 2).max() < 1e-4
    # ... whereas the exact identity in f32 is garbage out there:
    wr32, wi32 = _weid(np.float32(X), np.float32(Y))
    id_kx32 = -2.0 * (np.float32(X) * np.asarray(wr32)
                      - np.float32(Y) * np.asarray(wi32))
    rel_id = np.abs(np.asarray(id_kx32, np.float64) - kx64) / np.maximum(
        np.abs(kx64), 1e-300)
    deep = (X > 3e3) & (np.abs(kx64) > 1e-14)
    assert rel_id[deep].max() > 1.0  # >100% error — the bug this guards


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
