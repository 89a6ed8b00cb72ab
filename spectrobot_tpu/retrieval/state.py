"""Retrieval state vector and forward-model builder (C15-C17, SURVEY.md).

The reference (fedef17/SpectRobot ``spect_main_module`` bayes/retrieval
classes [SURVEY.md 1.2]) retrieves temperature and VMR profiles from limb
scans.  TPU-native design: the state is a pytree
``{"T": [n_lev], "ln_vmr": {species: [n_lev]}}`` flattened with
``ravel_pytree``; the forward model is ONE jit-able function state -> y
(concatenated channel radiances over all rays), differentiable end-to-end, so
Jacobians come from ``jax.jacfwd`` (forward-mode: n_x tangents through one
linearised pass) with a finite-difference harness beside it (config 4,
BASELINE.json:10).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from spectrobot_tpu.data.atmosphere import Atmosphere, Planet
from spectrobot_tpu.data.nlte import DeviceNLTE
from spectrobot_tpu.forward.geometry import limb_path_cg, nadir_path_cg
from spectrobot_tpu.forward.limb import limb_radiance, nadir_radiance
from spectrobot_tpu.ops.ils import apply_ils
from spectrobot_tpu.ops.strengths import DeviceLines


def make_state(atm: Atmosphere, retrieve_vmr: Sequence[str],
               T_surface: Optional[float] = None,
               retrieve_temperature: bool = True) -> Dict:
    """Initial state from an atmosphere: kinetic T profile (unless
    ``retrieve_temperature=False`` — VMR-only retrievals hold T fixed, as the
    reference's bayes sets allow per-quantity switches) + log-VMR profiles of
    the retrieved species (log keeps VMRs positive under LM steps).
    Pass ``T_surface`` to ALSO retrieve the surface temperature (nadir)."""
    state: Dict = {
        "ln_vmr": {s: jnp.log(atm.vmr[s]) for s in retrieve_vmr},
    }
    if retrieve_temperature:
        state["T"] = atm.T
    if T_surface is not None:
        state["T_surface"] = jnp.asarray(T_surface, atm.T.dtype)
    return state


def apply_state(atm: Atmosphere, state: Dict) -> Atmosphere:
    out = atm.with_temperature(state["T"]) if "T" in state else atm
    for s, lv in state["ln_vmr"].items():
        out = out.with_vmr(s, jnp.exp(lv))
    return out  # (surface parameters are consumed by the forward, not atm)


def build_forward(
    base_atm: Atmosphere,
    lines: DeviceLines,
    nu_grid: jnp.ndarray,
    species: Sequence[str],
    planet: Planet,
    tangent_heights_m: Optional[jnp.ndarray] = None,
    sec_theta: Optional[jnp.ndarray] = None,
    T_surface: Optional[float] = None,
    emissivity: float = 1.0,
    ils_W: Optional[jnp.ndarray] = None,
    fov_V: Optional[jnp.ndarray] = None,
    nlte: Optional[DeviceNLTE] = None,
    n_sub: int = 4,
    *,
    variant: str = "humlicek4",
    cutoff_cm1: Optional[float] = 25.0,
    chunk: int = 256,
    analytic_jvp=True,  # True/"fwd" | "rev" | False (ops.opacity._ad_mode)
    nu_off: Optional[jnp.ndarray] = None,
    engine: str = "jnp",
    interpret: bool = False,  # engine='pallas' on CPU (tests)
    cia=None,  # ops.cia.DeviceCIA: additive continuum (differentiable)
) -> Callable[[Dict], jnp.ndarray]:
    """Build F: state -> y.

    Limb mode when ``tangent_heights_m`` is given (deep-space background),
    nadir mode when ``sec_theta``/``T_surface`` are given.  ``ils_W`` maps
    the fine grid to instrument channels; ``fov_V`` [n_obs, n_ray] smears a
    fine tangent-height ladder into observed FOVs (ops.ils.fov_matrix) —
    together the full C14 ILS/FOV convolution.  Output y is flattened
    [n_obs_ray * n_chan].
    """
    kw = dict(variant=variant, cutoff_cm1=cutoff_cm1, chunk=chunk,
              analytic_jvp=analytic_jvp, nu_off=nu_off, engine=engine,
              interpret=interpret, cia=cia)

    def forward(state: Dict) -> jnp.ndarray:
        atm = apply_state(base_atm, state)
        if tangent_heights_m is not None:
            cg = limb_path_cg(atm, species, tangent_heights_m, planet, n_sub)
            I = limb_radiance(nu_grid, lines, cg, nlte, **kw)
        else:
            ts = state.get("T_surface", T_surface)  # retrievable (nadir)
            cg = nadir_path_cg(atm, species, sec_theta, n_sub)
            I = nadir_radiance(nu_grid, lines, cg, ts,
                               emissivity=emissivity, nlte=nlte, **kw)
        if fov_V is not None:
            from spectrobot_tpu.ops.ils import apply_fov
            I = apply_fov(I, fov_V)
        if ils_W is not None:
            I = apply_ils(I, ils_W)
        return I.reshape(-1)

    return forward


def build_forward_lut(
    base_atm: Atmosphere,
    lut,  # ops.lut.OpacityLUT | ops.lut.NLTELUT
    species: Sequence[str],
    planet: Planet,
    tangent_heights_m: Optional[jnp.ndarray] = None,
    sec_theta: Optional[jnp.ndarray] = None,
    T_surface: Optional[float] = None,
    emissivity: float = 1.0,
    ils_W: Optional[jnp.ndarray] = None,
    fov_V: Optional[jnp.ndarray] = None,
    nlte: Optional[DeviceNLTE] = None,
    n_sub: int = 4,
    cia=None,
) -> Callable[[Dict], jnp.ndarray]:
    """Build F: state -> y through the (P, T) LUT runtime tier (C9,
    reference call stack 4.3: ``makeLUT*`` then interpolate) — the bilinear
    table interpolation is differentiable in (T, log p) and in the VMR
    state, so jacfwd produces the Jacobian the LM loop needs WITHOUT any
    line summation per iteration (VERDICT.md round-2 item 4: 'the reference
    runs its LUT tier precisely to make retrieval loops cheap').

    ``lut`` is an LTE ``OpacityLUT`` or the per-level-group ``NLTELUT``
    (pass ``nlte`` with the latter so level populations contract against
    the cached coefficient tables).
    """
    from spectrobot_tpu.forward.limb import radiance_from_tau
    from spectrobot_tpu.ops.lut import (
        NLTELUT, layer_tau_lut, layer_tau_nlte_lut,
    )

    nu_grid = lut.nu_grid
    is_nlte_tier = isinstance(lut, NLTELUT)

    def forward(state: Dict) -> jnp.ndarray:
        atm = apply_state(base_atm, state)
        if tangent_heights_m is not None:
            cg = limb_path_cg(atm, species, tangent_heights_m, planet, n_sub)
            ts = None
        else:
            cg = nadir_path_cg(atm, species, sec_theta, n_sub)
            ts = state.get("T_surface", T_surface)
        if is_nlte_tier:
            dtau, dtau_em = layer_tau_nlte_lut(lut, cg, nlte)
        else:
            dtau = dtau_em = layer_tau_lut(lut, cg)
        I = radiance_from_tau(nu_grid, cg, dtau, dtau_em, cia=cia,
                              T_surface=ts, emissivity=emissivity)
        if fov_V is not None:
            from spectrobot_tpu.ops.ils import apply_fov
            I = apply_fov(I, fov_V)
        if ils_W is not None:
            I = apply_ils(I, ils_W)
        return I.reshape(-1)

    return forward


def flatten_state(state: Dict) -> Tuple[jnp.ndarray, Callable]:
    """state pytree <-> flat vector (fixed ordering via ravel_pytree)."""
    flat, unravel = ravel_pytree(state)
    return flat, unravel


def jacobian_fwd(forward_flat: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic Jacobian K [n_y, n_x] by forward-mode AD (C15)."""
    return jax.jacfwd(forward_flat)(x)


def jacobian_fwd_chunked(forward_flat: Callable, x: jnp.ndarray,
                         chunk: int = 16) -> jnp.ndarray:
    """Analytic Jacobian in tangent CHUNKS — bounds the live tangent batch to
    ``chunk`` columns (SURVEY.md 8.4 hard part 3: 'Jacobian memory —
    forward-mode batching rather than naive reverse-mode').  Same result as
    :func:`jacobian_fwd`; use when n_x x spectrum does not fit in HBM."""
    n_x = x.shape[0]
    eye = jnp.eye(n_x, dtype=x.dtype)
    cols = []
    for s in range(0, n_x, chunk):
        tang = eye[s:s + chunk]

        def one(v):
            return jax.jvp(forward_flat, (x,), (v,))[1]

        cols.append(jax.vmap(one)(tang))         # [chunk, n_y]
    return jnp.concatenate(cols, axis=0).T


def jacobian_fd(forward_flat: Callable, x: jnp.ndarray,
                eps: float = 1e-3) -> jnp.ndarray:
    """Central finite-difference Jacobian — the config-4 cross-check harness
    (BASELINE.json:10).  eps is scaled per-parameter by max(|x_i|, 1)."""
    import numpy as np
    x = np.asarray(x)
    cols = []
    for i in range(x.shape[0]):
        h = eps * max(abs(x[i]), 1.0)
        xp = x.copy(); xp[i] += h
        xm = x.copy(); xm[i] -= h
        cols.append((np.asarray(forward_flat(jnp.asarray(xp)))
                     - np.asarray(forward_flat(jnp.asarray(xm)))) / (2 * h))
    return np.stack(cols, axis=1)
