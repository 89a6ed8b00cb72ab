"""Opacity accumulation (C6) vs the independent NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.data import tips
from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.opacity import cross_sections as _cross_sections_raw
from spectrobot_tpu.ops.opacity import cross_sections_batch as _cross_sections_batch_raw

# jit wrappers (persistent-cache friendly on this slow-compile CPU image)
cross_sections = jax.jit(
    _cross_sections_raw,
    static_argnames=("chunk", "variant", "cutoff_cm1", "analytic_jvp"))
cross_sections_batch = jax.jit(
    _cross_sections_batch_raw,
    static_argnames=("chunk", "variant", "cutoff_cm1", "analytic_jvp"))
from spectrobot_tpu.ops.strengths import device_lines_from_linelist

SPECIES = [(2, 1)]


def _setup(j_max=25):
    ll = co2_15um_band(j_max=j_max)
    dl = device_lines_from_linelist(ll, SPECIES, dtype=jnp.float64)
    nu = np.linspace(640.0, 700.0, 4001)
    T, p = 220.0, 400.0
    q_ratio = np.full(len(ll), tips.q_of_T(2, 1, 296.0) / tips.q_of_T(2, 1, T))
    return ll, dl, nu, T, p, q_ratio


def test_cross_section_matches_oracle_weideman():
    ll, dl, nu, T, p, q_ratio = _setup()
    ref_a, ref_e = numpy_ref.cross_section(nu, ll, T, p, 0.3 * p, q_ratio,
                                           cutoff=25.0)
    got_a, got_e = cross_sections(jnp.asarray(nu), dl, T, p, 0.3 * p,
                                  variant="weideman", cutoff_cm1=25.0)
    # q-table linear interp vs exact introduces ~1e-4; use scaled tolerance.
    np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=5e-4,
                               atol=ref_a.max() * 1e-9)
    np.testing.assert_allclose(np.asarray(got_e), ref_e, rtol=5e-4,
                               atol=ref_e.max() * 1e-9)


def test_cross_section_humlicek_close():
    ll, dl, nu, T, p, q_ratio = _setup()
    ref_a, _ = numpy_ref.cross_section(nu, ll, T, p, 0.0, q_ratio, cutoff=25.0)
    got_a, _ = cross_sections(jnp.asarray(nu), dl, T, p, 0.0,
                              variant="humlicek4", cutoff_cm1=25.0)
    np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=2e-3,
                               atol=ref_a.max() * 1e-7)


def test_chunk_invariance():
    _, dl, nu, T, p, _ = _setup(j_max=17)  # deliberately awkward line count
    a1, e1 = cross_sections(jnp.asarray(nu), dl, T, p, chunk=7)
    a2, e2 = cross_sections(jnp.asarray(nu), dl, T, p, chunk=256)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-12)


def test_nlte_weights_enter_linearly():
    _, dl, nu, T, p, _ = _setup(j_max=10)
    L = dl.n_lines
    wa = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.5, L))
    we = jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.5, L))
    a, e = cross_sections(jnp.asarray(nu), dl, T, p, w_abs=wa, w_em=we)
    a1, e1 = cross_sections(jnp.asarray(nu), dl, T, p,
                            w_abs=2.0 * wa, w_em=3.0 * we)
    np.testing.assert_allclose(np.asarray(a1), 2 * np.asarray(a), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(e1), 3 * np.asarray(e), rtol=1e-10)


def test_layer_batching_matches_loop():
    _, dl, nu, _, _, _ = _setup(j_max=12)
    T_lay = jnp.asarray([180.0, 220.0, 260.0])
    p_lay = jnp.asarray([600.0, 60.0, 6.0])
    ps_lay = 0.9 * p_lay
    batch_a, batch_e = cross_sections_batch(jnp.asarray(nu), dl, T_lay, p_lay,
                                            ps_lay)
    for i in range(3):
        a, e = cross_sections(jnp.asarray(nu), dl, T_lay[i], p_lay[i], ps_lay[i])
        np.testing.assert_allclose(np.asarray(batch_a[i]), np.asarray(a),
                                   rtol=1e-12)


def test_jit_and_grad():
    _, dl, nu, _, _, _ = _setup(j_max=8)
    nu = jnp.asarray(nu[:501])

    @jax.jit
    def total_od(T):
        # reverse-mode needs the plain-AD path (analytic JVP is fwd-only)
        a, _ = cross_sections(nu, dl, T, 300.0, analytic_jvp=False)
        return jnp.sum(a)

    # T0 must sit INSIDE a Q-table interval (the table interp is piecewise
    # linear; FD across a node would straddle the derivative kink).
    T0 = 221.3
    g = jax.grad(total_od)(T0)
    # FD cross-check — the whole stack must be differentiable (SURVEY.md C15).
    eps = 1e-3
    fd = (total_od(T0 + eps) - total_od(T0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)
