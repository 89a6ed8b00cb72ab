"""RT integrator (C13) vs sequential oracle + analytic cases."""

import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.forward.rt import radiance_along_ray, transmittance


def test_matches_sequential_oracle():
    rng = np.random.default_rng(3)
    dtau = rng.uniform(0.0, 1.5, (12, 64))
    src = rng.uniform(0.0, 2.0, (12, 64))
    bg = rng.uniform(0.0, 1.0, 64)
    ref = numpy_ref.radiance_along_ray(dtau, src, bg)
    got = radiance_along_ray(jnp.asarray(dtau), jnp.asarray(src), jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12)


def test_isothermal_opaque_is_source():
    # Very thick isothermal path -> I = S (blackbody limit).
    dtau = jnp.full((20, 8), 10.0)
    src = jnp.full((20, 8), 3.14)
    got = radiance_along_ray(dtau, src)
    np.testing.assert_allclose(np.asarray(got), 3.14, rtol=1e-10)


def test_transparent_passes_background():
    dtau = jnp.zeros((5, 8))
    src = jnp.ones((5, 8))
    bg = jnp.full(8, 7.0)
    got = radiance_along_ray(dtau, src, bg)
    np.testing.assert_allclose(np.asarray(got), 7.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(transmittance(dtau)), 1.0)


def test_batched_rays():
    rng = np.random.default_rng(4)
    dtau = rng.uniform(0, 1, (3, 7, 16))   # [ray, seg, nu]
    src = rng.uniform(0, 1, (3, 7, 16))
    got = np.asarray(radiance_along_ray(jnp.asarray(dtau), jnp.asarray(src)))
    for r in range(3):
        ref = numpy_ref.radiance_along_ray(dtau[r], src[r])
        np.testing.assert_allclose(got[r], ref, rtol=1e-12)
