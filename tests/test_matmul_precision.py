"""Tripwire: hot contractions must pin HIGHEST matmul precision.

On TPU the DEFAULT f32 matmul runs at bf16 precision; that corrupted
radiances by ~0.4% and produced wrong-sign Jacobian tangents (cancelling
x^2*wr basis terms), breaking LM convergence end-to-end — found only by
running a full retrieval on hardware.  These tests inspect the jaxprs so the
pins cannot be silently dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectrobot_tpu.data.synth import co2_15um_band
from spectrobot_tpu.ops.opacity import (
    _tangent_via_basis, accumulate_jnp, line_kernel_inputs,
)
from spectrobot_tpu.ops.strengths import device_lines_from_linelist


def _dot_precisions(jaxpr):
    out = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                out.append(eqn.params.get("precision"))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s2 in sub:
                        if hasattr(s2, "jaxpr"):
                            walk(s2.jaxpr)
    walk(jaxpr.jaxpr)
    return out


def _setup():
    dl = device_lines_from_linelist(co2_15um_band(j_max=8), [(2, 1)],
                                    dtype=jnp.float32)
    kl = line_kernel_inputs(dl, 220.0, 100.0, 50.0,
                            amp_weights=jnp.ones((2, dl.n_lines), jnp.float32))
    nu = jnp.asarray(np.linspace(-10, 10, 256), jnp.float32)
    return nu, kl


def test_accumulate_contraction_pins_highest():
    nu, kl = _setup()
    jx = jax.make_jaxpr(lambda: accumulate_jnp(nu, kl, chunk=128))()
    precs = _dot_precisions(jx)
    assert precs, "no dot_general found — did the contraction change?"
    for p in precs:
        assert p == (jax.lax.Precision.HIGHEST,) * 2, p


def test_tangent_contractions_pin_highest():
    nu, kl = _setup()
    zeros = (jnp.zeros_like(kl.nu_c), jnp.zeros_like(kl.scale_x),
             jnp.zeros_like(kl.y), jnp.zeros_like(kl.amps))
    jx = jax.make_jaxpr(lambda: _tangent_via_basis(
        nu, kl.nu_c, kl.scale_x, kl.y, kl.amps, *zeros,
        chunk=128, variant="humlicek4", cutoff_cm1=25.0))()
    precs = _dot_precisions(jx)
    assert len(precs) >= 4  # four stable-basis contractions (K, Kx, xKx, Ky)
    for p in precs:
        assert p == (jax.lax.Precision.HIGHEST,) * 2, p
