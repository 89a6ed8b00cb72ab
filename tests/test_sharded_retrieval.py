"""Distributed Jacobian assembly (C26) on the emulated mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.parallel.mesh import make_mesh
from spectrobot_tpu.parallel.retrieval import (
    allgather_jacobian, sharded_normal_equations,
)


def _problem(n_y=512, n_x=12, seed=0):
    rng = np.random.default_rng(seed)
    K = rng.standard_normal((n_y, n_x))
    r = rng.standard_normal(n_y)
    inv_se = rng.uniform(0.5, 2.0, n_y)
    return jnp.asarray(K), jnp.asarray(r), jnp.asarray(inv_se)


def test_normal_equations_match_dense():
    K, r, inv_se = _problem()
    mesh = make_mesh((2, 1, 4))
    f = sharded_normal_equations(mesh, axes=("ray", "nu"))
    H, b = f(K, r, inv_se)
    H_ref = np.asarray(K).T @ np.diag(np.asarray(inv_se)) @ np.asarray(K)
    b_ref = np.asarray(K).T @ (np.asarray(inv_se) * np.asarray(r))
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-10)


def test_allgather_reconstructs_K():
    K, _, _ = _problem(n_y=256, n_x=7)
    mesh = make_mesh((4, 1, 2))
    f = allgather_jacobian(mesh, axes=("ray", "nu"))
    K_full = f(K)
    np.testing.assert_allclose(np.asarray(K_full), np.asarray(K), rtol=0)


def test_lm_step_parity_sharded_vs_local():
    # Solve the damped system from sharded H,b and compare with the
    # single-device solve — the full C26 path of the LM iteration.
    K, r, inv_se = _problem(n_y=1024, n_x=9, seed=4)
    mesh = make_mesh((2, 1, 4))
    f = sharded_normal_equations(mesh)
    H, b = f(K, r, inv_se)
    lam = 0.3
    dx = np.linalg.solve(np.asarray(H) + lam * np.eye(9), np.asarray(b))
    Kn = np.asarray(K); rn = np.asarray(r); wn = np.asarray(inv_se)
    H_ref = Kn.T @ (wn[:, None] * Kn)
    dx_ref = np.linalg.solve(H_ref + lam * np.eye(9), Kn.T @ (wn * rn))
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-9)
