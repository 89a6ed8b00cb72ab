"""Total internal partition sums Q(T) (component C2, SURVEY.md section 3).

The reference (fedef17/SpectRobot ``spect_classes.py`` [SURVEY.md 1.2]) scales
line strengths with TIPS partition sums.  TPU-native design: every
(molecule, isotopologue) gets a dense Q(T) table on a shared temperature grid,
packed into one ``(n_species, n_T)`` array; runtime evaluation is a single
``jnp.interp`` per species — branch-free, jit-friendly, trivially sharded.

Data source: official TIPS tables can be registered via
:func:`register_q_table`.  When no table is available (this image has no
network access), a physically-motivated rigid-rotor + harmonic-oscillator
model generates Q(T); because the SAME Q is used by the golden NumPy
reference and the TPU path, all acceptance configs remain self-consistent.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from spectrobot_tpu.constants import C2

# Shared temperature grid for all packed tables [K].
T_GRID = np.linspace(20.0, 1500.0, 297)  # 5 K spacing

# Rotational constants [cm-1] and symmetry numbers for the RRHO model.
#   linear:    (B, sigma, (omega_i, d_i)...)
#   nonlinear: ((A, B, C), sigma, (omega_i, d_i)...)
_RRHO: Dict[Tuple[int, int], dict] = {
    # CO2 isotopologues: linear, sigma=2 for 626/636 (symmetric), 1 otherwise
    (2, 1): dict(linear=True, B=0.39022, sigma=2,
                 modes=((1333.0, 1), (667.4, 2), (2349.1, 1))),
    (2, 2): dict(linear=True, B=0.39024, sigma=2,
                 modes=((1370.0, 1), (648.5, 2), (2283.5, 1))),
    (2, 3): dict(linear=True, B=0.36818, sigma=1,
                 modes=((1365.8, 1), (662.4, 2), (2332.1, 1))),
    (2, 4): dict(linear=True, B=0.37867, sigma=1,
                 modes=((1345.6, 1), (664.7, 2), (2340.0, 1))),
    (5, 1): dict(linear=True, B=1.93128, sigma=1, modes=((2143.3, 1),)),
    (5, 2): dict(linear=True, B=1.84604, sigma=1, modes=((2096.1, 1),)),
    (5, 3): dict(linear=True, B=1.93125, sigma=1, modes=((2091.7, 1),)),
    (1, 1): dict(linear=False, ABC=(27.8806, 14.5216, 9.2778), sigma=2,
                 modes=((3657.1, 1), (1594.7, 1), (3755.9, 1))),
    (1, 2): dict(linear=False, ABC=(27.8806, 14.5216, 9.2778), sigma=2,
                 modes=((3649.7, 1), (1588.3, 1), (3741.6, 1))),
    (1, 3): dict(linear=False, ABC=(27.8806, 14.5216, 9.2778), sigma=2,
                 modes=((3653.1, 1), (1591.3, 1), (3748.3, 1))),
    (1, 4): dict(linear=False, ABC=(23.4, 14.5, 9.1), sigma=1,
                 modes=((2723.7, 1), (1403.5, 1), (3707.5, 1))),
    (3, 1): dict(linear=False, ABC=(3.5537, 0.4453, 0.3948), sigma=2,
                 modes=((1103.1, 1), (700.9, 1), (1042.1, 1))),
    (4, 1): dict(linear=True, B=0.41901, sigma=1,
                 modes=((1284.9, 1), (588.8, 2), (2223.8, 1))),
    (6, 1): dict(linear=False, ABC=(5.2412, 5.2412, 5.2412), sigma=12,
                 modes=((2917.0, 1), (1533.3, 2), (3019.5, 3), (1310.8, 3))),
    (7, 1): dict(linear=True, B=1.43768, sigma=2, modes=((1580.2, 1),)),
    (22, 1): dict(linear=True, B=1.99824, sigma=2, modes=((2358.6, 1),)),
}

# User-registered override tables: (mol, iso) -> Q on T_GRID.
_REGISTERED: Dict[Tuple[int, int], np.ndarray] = {}


def _q_rrho(spec: dict, T: np.ndarray) -> np.ndarray:
    T = np.asarray(T, dtype=np.float64)
    if spec["linear"]:
        # High-T limit of the linear-rotor sum with first-order correction:
        # Q_rot = (1/sigma) * (T/(c2 B)) * (1 + c2 B/(3T) + ...)
        beta = C2 * spec["B"] / T
        q_rot = (1.0 / spec["sigma"]) * (1.0 / beta) * (1.0 + beta / 3.0 + beta ** 2 / 15.0)
    else:
        A, B, C = spec["ABC"]
        q_rot = (np.sqrt(np.pi) / spec["sigma"]) * np.sqrt(
            (T / C2) ** 3 / (A * B * C)
        )
    q_vib = np.ones_like(T)
    for omega, d in spec["modes"]:
        q_vib = q_vib * (1.0 - np.exp(-C2 * omega / T)) ** (-d)
    return q_rot * q_vib


def register_q_table(mol_id: int, iso_id: int, temps: np.ndarray, q: np.ndarray) -> None:
    """Register an external (e.g. official TIPS) Q(T) table; it overrides the
    built-in RRHO model for this isotopologue after re-interpolation onto
    the shared ``T_GRID``."""
    _REGISTERED[(mol_id, iso_id)] = np.interp(T_GRID, np.asarray(temps), np.asarray(q))


def q_of_T(mol_id: int, iso_id: int, T) -> np.ndarray:
    """Host-side Q(T) evaluation (numpy)."""
    tab = q_table(mol_id, iso_id)
    return np.interp(np.asarray(T, dtype=np.float64), T_GRID, tab)


def q_table(mol_id: int, iso_id: int) -> np.ndarray:
    key = (mol_id, iso_id)
    if key in _REGISTERED:
        return _REGISTERED[key]
    spec = _RRHO.get(key)
    if spec is None:
        # Fall back to main isotopologue of same molecule.
        spec = _RRHO.get((mol_id, 1))
    if spec is None:
        raise KeyError(f"No partition-function model for molecule {mol_id} iso {iso_id}")
    return _q_rrho(spec, T_GRID)


def pack_q_tables(species: list) -> np.ndarray:
    """Pack per-(mol, iso) tables into a dense (n_species, n_T) array for
    device staging.  ``species`` is a list of (mol_id, iso_id)."""
    return np.stack([q_table(m, i) for (m, i) in species], axis=0)
