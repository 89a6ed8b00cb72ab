"""Distributed OE/LM retrieval over the 8-device emulated mesh (C26
integrated with C16 — the round-2 production path, parallel/oe.py).

Parity contract: the sharded normal equations (psum-assembled on the
(ray, line, nu) mesh) and the full sharded LM retrieval must match the
single-device path to float64 roundoff.  The all_gather Jacobian is checked
against the dense ``jax.jacfwd`` of the unsharded forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
from spectrobot_tpu.data.synth import co2_15um_band, co_fundamental
from spectrobot_tpu.ops.ils import ils_matrix
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.parallel.mesh import make_mesh
from spectrobot_tpu.parallel.oe import make_sharded_oe
from spectrobot_tpu.retrieval.oe import OEConfig, retrieve
from spectrobot_tpu.retrieval.state import (
    build_forward, flatten_state, make_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 emulated devices")

SPECIES = ["CO2", "CO"]


@pytest.fixture(scope="module")
def scene():
    atm = mars_standard_atmosphere(n_lev=6, z_top=60e3)
    ll = co2_15um_band(j_max=8)
    co = co_fundamental(j_max=6)
    co.nu0[:] = co.nu0 - 2143.27 + 655.0
    ll = ll.concat(co)
    dl = device_lines_from_linelist(ll, [(2, 1), (5, 1)], dtype=jnp.float64)
    nu = jnp.asarray(np.linspace(645.0, 690.0, 256))
    h_t = jnp.asarray([6e3, 14e3, 22e3, 30e3])
    chans = np.linspace(648.0, 688.0, 24)
    W = jnp.asarray(ils_matrix(np.asarray(nu), chans, fwhm=1.0))
    return atm, dl, nu, h_t, W


def _single_device(scene, ils=True):
    atm, dl, nu, h_t, W = scene
    fwd = build_forward(atm, dl, nu, SPECIES, MARS, tangent_heights_m=h_t,
                        ils_W=W if ils else None, n_sub=2,
                        variant="humlicek4", cutoff_cm1=25.0, chunk=128)
    state0 = make_state(atm, ["CO"])
    x0, unravel = flatten_state(state0)
    fwd_flat = jax.jit(lambda x: fwd(unravel(x)))
    jac = jax.jit(lambda x: jax.jacfwd(fwd_flat)(x))
    return fwd_flat, jac, x0, state0


def _sharded(scene, mesh_shape=(2, 2, 2), ils=True):
    atm, dl, nu, h_t, W = scene
    mesh = make_mesh(mesh_shape, jax.devices()[: int(np.prod(mesh_shape))])
    state0 = make_state(atm, ["CO"])
    oe = make_sharded_oe(
        mesh, atm, dl, nu, SPECIES, MARS, h_t, state_template=state0,
        ils_W=W if ils else None, n_sub=2, variant="humlicek4",
        cutoff_cm1=25.0, chunk=128)
    x0, _ = flatten_state(state0)
    return oe, x0


def test_sharded_forward_matches(scene):
    fwd_flat, _, x0, _ = _single_device(scene)
    oe, x0s = _sharded(scene)
    np.testing.assert_allclose(np.asarray(x0s), np.asarray(x0), rtol=0)
    y_ref = np.asarray(fwd_flat(x0))
    y_sh = np.asarray(oe.forward_flat(x0))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-12, atol=0)


def test_sharded_normal_equations_match_dense(scene):
    fwd_flat, jac, x0, _ = _single_device(scene)
    oe, _ = _sharded(scene)

    y = np.asarray(fwd_flat(x0)) * 1.01 + 1e-9       # synthetic residual
    sigma = np.full(y.shape, 0.002 * y.max())
    oe.bind_observation(y, sigma)

    F, H, g = oe.normal_eqs(jnp.asarray(x0))
    K = np.asarray(jac(x0), np.float64)
    w = 1.0 / sigma.astype(np.float64) ** 2
    KtW = K.T * w[None, :]
    H_ref = KtW @ K
    g_ref = KtW @ (y - np.asarray(fwd_flat(x0), np.float64))
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-9)

    # The all_gather Jacobian is the dense Jacobian, row order included.
    K_sh = np.asarray(oe.jacobian(jnp.asarray(x0)))
    np.testing.assert_allclose(K_sh, K, rtol=1e-9, atol=1e-16)


def test_sharded_jacobian_row_order_no_ils(scene):
    """Without ILS the rows carry BOTH mesh axes ('ray', 'nu') — the
    all_gather must reassemble the (ray-major, nu-minor) flat order."""
    fwd_flat, jac, x0, _ = _single_device(scene, ils=False)
    oe, _ = _sharded(scene, ils=False)
    y_ref = np.asarray(fwd_flat(x0))
    np.testing.assert_allclose(np.asarray(oe.forward_flat(x0)), y_ref,
                               rtol=1e-12)
    K = np.asarray(jac(x0))
    K_sh = np.asarray(oe.jacobian(jnp.asarray(x0)))
    np.testing.assert_allclose(K_sh, K, rtol=1e-9, atol=1e-16)


def test_sharded_retrieval_matches_single_device(scene, tmp_path):
    atm, dl, nu, h_t, W = scene
    rng = np.random.default_rng(11)

    fwd_flat, jac, x_true, state0 = _single_device(scene)
    y_clean = np.asarray(fwd_flat(x_true))
    sigma = np.full(y_clean.shape, 0.005 * y_clean.max())
    y_obs = y_clean + sigma * rng.standard_normal(y_clean.shape)

    n_lev = atm.n_lev
    x0 = np.asarray(x_true).copy()
    x0[:n_lev] += 6.0                       # biased T start
    S_a = np.diag(np.concatenate([np.full(n_lev, 10.0 ** 2),
                                  np.full(n_lev, np.log(5.0) ** 2)]))
    cfg = OEConfig(max_iter=8, chi2_rel_tol=1e-4)

    res_ref = retrieve(fwd_flat, jac, jnp.asarray(y_obs), jnp.asarray(x0),
                       jnp.asarray(x0), S_a, jnp.asarray(sigma), cfg)

    oe, _ = _sharded(scene)
    oe.bind_observation(y_obs, sigma)
    res_sh = retrieve(oe.forward_flat, oe.jacobian, jnp.asarray(y_obs),
                      jnp.asarray(x0), jnp.asarray(x0), S_a,
                      jnp.asarray(sigma), cfg, normal_eqs=oe.normal_eqs)

    assert res_sh.converged == res_ref.converged
    assert res_sh.n_iter == res_ref.n_iter
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-8)
    np.testing.assert_allclose(res_sh.chi2, res_ref.chi2, rtol=1e-8)
    np.testing.assert_allclose(res_sh.S_hat, res_ref.S_hat, rtol=1e-6)
    np.testing.assert_allclose(res_sh.dof, res_ref.dof, rtol=1e-8)
