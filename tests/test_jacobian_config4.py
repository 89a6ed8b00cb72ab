"""Acceptance config 4 (BASELINE.json:10): forward model + analytic
Jacobians wrt temperature/VMR profiles, cross-checked against central finite
differences."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.ils import ils_matrix
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.retrieval.state import (
    build_forward, flatten_state, jacobian_fd, jacobian_fwd, make_state,
)


def _setup():
    atm = mars_standard_atmosphere(n_lev=8, z_top=70e3)
    ll = co2_15um_band(j_max=10)
    dl = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(660.0, 675.0, 301))
    W = jnp.asarray(ils_matrix(np.asarray(nu), np.linspace(662, 673, 23), 0.7))
    fwd = build_forward(
        atm, dl, nu, ["CO2"], MARS,
        tangent_heights_m=jnp.asarray([8e3, 25e3, 45e3]),
        ils_W=W, n_sub=2, variant="weideman", cutoff_cm1=25.0)
    state = make_state(atm, ["CO2"])
    x0, unravel = flatten_state(state)
    fwd_flat = jax.jit(lambda x: fwd(unravel(x)))
    return fwd_flat, x0


def test_jacobian_matches_finite_difference():
    fwd_flat, x0 = _setup()
    K = np.asarray(jacobian_fwd(fwd_flat, x0))
    K_fd = jacobian_fd(fwd_flat, np.asarray(x0), eps=3e-5)
    assert K.shape == K_fd.shape == (3 * 23, x0.shape[0])
    scale = np.abs(K).max(axis=0, keepdims=True)  # per-parameter scale
    # Analytic vs FD to a few parts in 1e4 of each parameter's response.
    np.testing.assert_allclose(K, K_fd, atol=1e-4 * scale.max(axis=1).max(),
                               rtol=5e-4)


def test_jacobian_columns_nonzero_where_sensitive():
    fwd_flat, x0 = _setup()
    K = np.asarray(jacobian_fwd(fwd_flat, x0))
    # Temperature sensitivities exist (first 8 params are T levels, the rest
    # ln VMR): every block has at least one strongly responding column.
    assert np.abs(K[:, :8]).max() > 0
    assert np.abs(K[:, 8:]).max() > 0
    # Rays at low tangent heights are insensitive to the topmost levels'
    # VMR below... (sanity: no NaNs anywhere)
    assert np.isfinite(K).all()


def test_jvp_linearity():
    fwd_flat, x0 = _setup()
    v = jnp.asarray(np.random.default_rng(0).standard_normal(x0.shape)) * 0.1
    _, jvp1 = jax.jvp(fwd_flat, (x0,), (v,))
    _, jvp2 = jax.jvp(fwd_flat, (x0,), (2.0 * v,))
    np.testing.assert_allclose(np.asarray(jvp2), 2 * np.asarray(jvp1),
                               rtol=1e-10)


def test_chunked_jacobian_matches_full():
    from spectrobot_tpu.retrieval.state import jacobian_fwd_chunked
    fwd_flat, x0 = _setup()
    K = np.asarray(jacobian_fwd(fwd_flat, x0))
    K_ch = np.asarray(jacobian_fwd_chunked(fwd_flat, x0, chunk=5))
    np.testing.assert_allclose(K_ch, K, rtol=1e-8,
                               atol=np.abs(K).max() * 1e-12)
