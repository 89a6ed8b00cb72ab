"""float32 wavenumber rebasing (DeviceLines.nu_ref).

At 650 cm-1 a float32 coordinate quantises at ~3e-5 cm-1 — comparable to
Doppler HWHMs — so ABSOLUTE f32 coordinates corrupt dnu = nu - nu_c at the
percent level in line cores.  Offsets from the window centre (the default
staging) restore ~1e-6 cm-1 accuracy.  These tests pin the improvement.
"""

import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.opacity import cross_sections
from spectrobot_tpu.ops.strengths import device_lines_from_linelist


def _sigma(dtype, nu_ref, nu_host):
    ll = co2_15um_band(j_max=20)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=dtype, nu_ref=nu_ref)
    nu = jnp.asarray(nu_host, dtype)
    # The offset grid is staged from FLOAT64 — casting the absolute grid to
    # f32 first would already have destroyed the precision being recovered.
    nu_off = jnp.asarray(nu_host - float(dl.nu_ref), dtype)
    sa, _ = cross_sections(nu, dl, 210.0, 60.0, p_self_pa=50.0, chunk=128,
                           nu_off=nu_off)
    return np.asarray(sa, dtype=np.float64)


def test_rebased_f32_much_closer_to_f64():
    nu_host = np.linspace(655.0, 680.0, 4001)
    ref = _sigma(jnp.float64, 0.0, nu_host)
    raw32 = _sigma(jnp.float32, 0.0, nu_host)      # absolute f32 coords
    reb32 = _sigma(jnp.float32, None, nu_host)     # default rebasing

    denom = np.maximum(ref, ref.max() * 1e-6)
    err_raw = np.max(np.abs(raw32 - ref) / denom)
    err_reb = np.max(np.abs(reb32 - ref) / denom)
    # Rebasing must beat absolute coordinates by a wide margin; the
    # residual ~0.3% is generic f32 rounding in widths/strengths, not
    # coordinate cancellation.
    assert err_reb < 5e-3, err_reb
    assert err_raw > 10 * err_reb, (err_raw, err_reb)


def test_rebasing_exact_in_f64():
    nu_host = np.linspace(655.0, 680.0, 1001)
    a = _sigma(jnp.float64, 0.0, nu_host)
    b = _sigma(jnp.float64, None, nu_host)
    # f64 rebasing changes dnu by ~1e-13 relative; steep Voigt cores amplify
    # that to ~1e-9 in sigma — far below any physical tolerance.
    np.testing.assert_allclose(b, a, rtol=1e-7)


def test_nu0_abs_round_trip():
    ll = co2_15um_band(j_max=10)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(dl.nu0_abs), ll.nu0, rtol=1e-12)
    assert float(dl.nu_ref) != 0.0
