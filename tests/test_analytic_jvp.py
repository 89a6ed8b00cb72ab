"""Analytic derivatives of the opacity accumulation (SURVEY.md 8.4 hard
part 3; PAPERS.md:9): the custom-JVP basis decomposition must agree with
plain autodiff of the same primal, in both directions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrobot_tpu.ops.opacity import (
    KernelLines, _tangent_transpose, _tangent_via_basis, accumulate_jnp,
    line_kernel_inputs, make_accumulate_op,
)
from spectrobot_tpu.ops.strengths import device_lines_from_linelist
from spectrobot_tpu.data.synth import co2_15um_band


def _inputs(dtype=jnp.float64, j_max=10):
    dl = device_lines_from_linelist(co2_15um_band(j_max=j_max), [(2, 1)],
                                    dtype=dtype, nu_ref=0.0)
    kl = line_kernel_inputs(dl, 230.0, 250.0, 100.0,
                            amp_weights=jnp.ones((2, dl.n_lines), dtype))
    nu = jnp.asarray(np.linspace(660.0, 674.0, 300), dtype)
    return nu, kl


@pytest.mark.parametrize("cutoff", [25.0, None])
def test_analytic_jvp_matches_ad_jvp(cutoff):
    nu, kl = _inputs()
    # NOTE comparison needs the high-accuracy evaluator: AD differentiates
    # the APPROXIMANT, the analytic tangent applies the exact identity
    # w' = -2 z w + 2i/sqrt(pi) — they differ by the approximation error
    # (~1e-4 for humlicek4, ~1e-7 for weideman-32 in f64).
    op = make_accumulate_op(chunk=64, cutoff_cm1=cutoff, variant="weideman")
    plain = lambda nc, sx, y, am: accumulate_jnp(
        nu, KernelLines(nc, sx, y, am), chunk=64, cutoff_cm1=cutoff,
        variant="weideman")
    rng = np.random.default_rng(0)
    args = (kl.nu_c, kl.scale_x, kl.y, kl.amps)
    tans = tuple(jnp.asarray(rng.standard_normal(a.shape) * np.asarray(a).std()
                             + 1e-12) for a in args)
    p1, t1 = jax.jvp(lambda *a: op(nu, *a), args, tans)
    p2, t2 = jax.jvp(plain, args, tans)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-12)
    scale = np.abs(np.asarray(t2)).max()
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-5,
                               atol=scale * 1e-7)


def test_analytic_jacfwd_matches_ad_jacfwd():
    # Through the strength/width prologue wrt a scalar T — the real use.
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64, nu_ref=0.0)
    nu = jnp.asarray(np.linspace(662.0, 672.0, 200))
    op = make_accumulate_op(chunk=64, variant="weideman")

    def f_analytic(T):
        kl = line_kernel_inputs(dl, T, 300.0, 50.0,
                                amp_weights=jnp.ones((2, dl.n_lines)))
        return op(nu, kl.nu_c, kl.scale_x, kl.y, kl.amps)

    def f_plain(T):
        kl = line_kernel_inputs(dl, T, 300.0, 50.0,
                                amp_weights=jnp.ones((2, dl.n_lines)))
        return accumulate_jnp(nu, kl, chunk=64, variant="weideman")

    Ts = jnp.asarray([200.0, 250.0])
    J1 = np.asarray(jax.jacfwd(f_analytic)(Ts[0]))
    J2 = np.asarray(jax.jacfwd(f_plain)(Ts[0]))
    np.testing.assert_allclose(J1, J2, rtol=2e-5, atol=np.abs(J2).max() * 1e-7)


def test_tangent_transpose_matches_ad_vjp():
    # The analytic transpose (ready for reverse-mode once JAX composes
    # linear_call/custom_transpose with vmap) must equal the AD VJP of the
    # tangent map.
    nu, kl = _inputs()
    kw = dict(chunk=64, variant="humlicek4", cutoff_cm1=25.0)
    args = (kl.nu_c, kl.scale_x, kl.y, kl.amps)
    tangent_fn = lambda *t: _tangent_via_basis(nu, *args, *t, **kw)
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.standard_normal((2, nu.shape[0])))
    zero_t = tuple(jnp.zeros_like(a) for a in args)
    _, vjp = jax.vjp(tangent_fn, *zero_t)
    want = vjp(ct)
    got = _tangent_transpose(nu, *args, ct, **kw)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        np.testing.assert_allclose(g, w, rtol=1e-8,
                                   atol=np.abs(w).max() * 1e-10)


def test_analytic_vjp_matches_ad_grad():
    # mode='rev' (custom_vjp with the explicit analytic transpose) must give
    # the same gradients as plain AD through the same primal.
    nu, kl = _inputs()
    kw = dict(chunk=64, variant="weideman", cutoff_cm1=25.0)
    op = make_accumulate_op(mode="rev", **kw)
    plain = lambda nc, sx, y, am: accumulate_jnp(
        nu, KernelLines(nc, sx, y, am), **kw)
    args = (kl.nu_c, kl.scale_x, kl.y, kl.amps)
    rng = np.random.default_rng(2)
    wgt = jnp.asarray(rng.standard_normal((2, nu.shape[0])))
    loss_a = lambda *a: jnp.sum(wgt * op(nu, *a))
    loss_p = lambda *a: jnp.sum(wgt * plain(*a))
    ga = jax.grad(loss_a, argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    # plain AD differentiates the approximant; the analytic transpose applies
    # the exact identity — weideman in f64 keeps the mismatch ~1e-7.
    for a, p in zip(ga, gp):
        a, p = np.asarray(a), np.asarray(p)
        np.testing.assert_allclose(a, p, rtol=2e-5, atol=np.abs(p).max() * 1e-7)


def test_analytic_jacrev_matches_jacfwd_through_prologue():
    # Through the strength/width prologue wrt T: jacrev over the 'rev' op
    # must match jacfwd over the 'fwd' op (the real retrieval-adjoint use).
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64, nu_ref=0.0)
    nu = jnp.asarray(np.linspace(662.0, 672.0, 200))
    op_f = make_accumulate_op(chunk=64, variant="weideman")
    op_r = make_accumulate_op(chunk=64, variant="weideman", mode="rev")

    def f(op):
        def g(T):
            kl = line_kernel_inputs(dl, T, 300.0, 50.0,
                                    amp_weights=jnp.ones((2, dl.n_lines)))
            return op(nu, kl.nu_c, kl.scale_x, kl.y, kl.amps)
        return g

    T0 = jnp.asarray(230.0)
    Jf = np.asarray(jax.jacfwd(f(op_f))(T0))
    Jr = np.asarray(jax.jacrev(f(op_r))(T0))
    np.testing.assert_allclose(Jr, Jf, rtol=1e-9,
                               atol=np.abs(Jf).max() * 1e-12)


def test_analytic_vjp_under_vmap():
    # custom_vjp must batch (the per-layer vmap in forward.limb.layer_tau).
    nu, kl = _inputs()
    op = make_accumulate_op(chunk=64, mode="rev")

    def loss(scale):
        return jnp.sum(op(nu, kl.nu_c, kl.scale_x, kl.y, kl.amps * scale))

    scales = jnp.asarray([0.5, 1.0, 2.0])
    g = jax.vmap(jax.grad(loss))(scales)
    base = float(loss(1.0))
    np.testing.assert_allclose(np.asarray(g), base, rtol=1e-10)


def test_analytic_vjp_through_limb_forward():
    # End-to-end: grad of a chi-square-like scalar through the full limb
    # radiance, analytic 'rev' vs plain AD.
    from spectrobot_tpu.data.atmosphere import MARS, mars_standard_atmosphere
    from spectrobot_tpu.forward.geometry import limb_path_cg
    from spectrobot_tpu.forward.limb import limb_radiance

    atm = mars_standard_atmosphere(n_lev=16, z_top=80e3)
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float64, nu_ref=0.0)
    nu = jnp.asarray(np.linspace(662.0, 672.0, 128))
    ths = jnp.asarray([20e3, 40e3])

    def loss(T, mode):
        cg = limb_path_cg(atm.with_temperature(T), ["CO2"], ths, MARS, 2)
        I = limb_radiance(nu, dl, cg, analytic_jvp=mode, variant="weideman")
        return jnp.sum(I ** 2)

    g_rev = jax.grad(lambda T: loss(T, "rev"))(atm.T)
    g_ad = jax.grad(lambda T: loss(T, False))(atm.T)
    g_rev, g_ad = np.asarray(g_rev), np.asarray(g_ad)
    np.testing.assert_allclose(g_rev, g_ad, rtol=2e-5,
                               atol=np.abs(g_ad).max() * 1e-7)


def test_analytic_jvp_under_vmap():
    # layer batching (vmap) over the op with tangents — the layer_tau path.
    nu, kl = _inputs()
    op = make_accumulate_op(chunk=64)

    def f(scale):
        return op(nu, kl.nu_c, kl.scale_x, kl.y, kl.amps * scale)

    scales = jnp.asarray([0.5, 1.0, 2.0])
    out = jax.vmap(jax.jacfwd(f))(scales)
    base = np.asarray(f(1.0))
    np.testing.assert_allclose(np.asarray(out[1]), base, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out[0]), base, rtol=1e-10)
