"""Line-of-sight radiative-transfer integrator (component C13, SURVEY.md).

The reference (fedef17/SpectRobot ``spect_main_module.radtran*`` [SURVEY.md
1.2/4.1]) integrates the RT equation segment-by-segment in Python/Fortran.
TPU-native formulation: fully batched tensor ops over (ray, segment, nu) with
a cumulative sum along the segment axis — no sequential host loop, XLA fuses
the whole chain; differentiable end-to-end for the Jacobians (C15).

Discrete emission-only RT along a ray whose segments are ordered from the
OBSERVER outward:

    I(nu) = sum_k S_k(nu) * (t_k(nu) - t_{k+1}(nu)) + I_bg(nu) * t_end(nu),
    t_k = exp(-sum_{j<k} dtau_j)        (transmittance observer -> segment k)

Scattering is out of scope (as in the reference — thermal IR limb/nadir).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def radiance_along_ray(
    dtau: jnp.ndarray,
    source: jnp.ndarray,
    I_background: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Integrate radiance for one or many rays.

    Args:
      dtau:   [..., n_seg, P] per-segment optical depth (observer-first order).
      source: [..., n_seg, P] per-segment source function radiance.
      I_background: [..., P] radiance entering the far end (surface Planck for
        nadir, deep space = 0 for limb). Default 0.

    Returns: [..., P] radiance at the observer.
    """
    c = jnp.cumsum(dtau, axis=-2)
    t_after = jnp.exp(-c)
    t_before = jnp.exp(-(c - dtau))
    emitted = jnp.sum(source * (t_before - t_after), axis=-2)
    if I_background is not None:
        emitted = emitted + I_background * t_after[..., -1, :]
    return emitted


def transmittance(dtau: jnp.ndarray) -> jnp.ndarray:
    """Total transmittance along the ray: [..., P]."""
    return jnp.exp(-jnp.sum(dtau, axis=-2))
