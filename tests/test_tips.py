"""Partition sums (component C2).

Round 2 (VERDICT.md item 2): every registered isotopologue is ANCHORED to
its HITRAN molparam Q(296 K) — exact by construction — and the temperature
dependence comes from explicit quantum state sums (exact linear-rotor J
sums, asymmetric-top diagonalisation for H2O, spherical-top sums for CH4).
Only RATIOS Q(296)/Q(T) enter line-strength scaling, so the anchor also
normalises away constant nuclear-spin degeneracy factors.
"""

import warnings

import numpy as np
import pytest

from spectrobot_tpu.data import tips


def test_q296_anchors_exact():
    """Q(296) equals the embedded HITRAN molparam value for EVERY iso."""
    for key, q296 in tips.Q296.items():
        got = float(tips.q_of_T(*key, 296.0))
        assert abs(got - q296) / q296 < 1e-10, (key, got, q296)


def test_linear_rotor_sum_matches_euler_maclaurin_high_T():
    """The exact J sum agrees with the analytic high-T expansion where the
    latter is valid (small c2 B / T) — cross-checks the sum machinery."""
    B, sigma, T = 0.39022, 2, np.array([296.0, 600.0, 1200.0])
    exact = tips._q_rot_linear(B, sigma, T)
    beta = tips.C2 * B / T
    approx = (1.0 / sigma) / beta * (1.0 + beta / 3.0 + beta ** 2 / 15.0)
    np.testing.assert_allclose(exact, approx, rtol=1e-6)


def test_asym_top_levels_match_known_h2o():
    """Lowest rigid-rotor H2O levels vs textbook J_{Ka,Kc} energies
    (rigid-rotor values from A, B, C; e.g. 1_01 = B + C)."""
    A, B, C = 27.8806, 14.5216, 9.2778
    E, g, par = tips._asym_top_levels(A, B, C, j_max=2)
    E0 = np.sort(E)[:4]
    # 0_00 = 0; 1_01 = B+C; 1_11 = A+C; 1_10 = A+B
    np.testing.assert_allclose(
        E0, [0.0, B + C, A + C, A + B], atol=1e-9)
    # ortho/para parity: ground state 0_00 is para (Ka+Kc even)
    assert par[0] == 0


def test_h2o_low_T_beats_classical():
    """At 50 K the direct sum must deviate from the classical rotor by
    several percent (that deviation is the point of diagonalising)."""
    spec = tips._SPECIES[(1, 1)]
    # The ortho/para-weighted sum is normalised so its high-T limit equals
    # the 1/sigma classical rotor (spin factors cancel into the anchor).
    T = np.array([50.0])
    q_exact = tips._q_rot_asym(spec["ABC"], spec["sigma"], "h2o", T)[0]
    q_class = tips._q_rot_classical(spec["ABC"], spec["sigma"], T)[0]
    assert abs(q_exact / q_class - 1.0) > 0.03
    # ... and converge to it at high T (equipartition).
    T = np.array([800.0])
    q_exact = tips._q_rot_asym(spec["ABC"], spec["sigma"], "h2o", T)[0]
    q_class = tips._q_rot_classical(spec["ABC"], spec["sigma"], T)[0]
    np.testing.assert_allclose(q_exact, q_class, rtol=0.02)


def test_q_monotone_increasing():
    for key in [(2, 1), (5, 1), (1, 1), (6, 1), (3, 1), (27, 1)]:
        q = tips.q_table(*key)
        assert np.all(np.diff(q) > 0)


def test_ratio_sane():
    # Q(296)/Q(T) < 1 for T > 296 and > 1 for T < 296.
    for key in [(2, 1), (1, 1)]:
        q296 = tips.q_of_T(*key, 296.0)
        assert q296 / tips.q_of_T(*key, 500.0) < 1.0
        assert q296 / tips.q_of_T(*key, 150.0) > 1.0


def test_co2_ratio_near_linear_in_T_low_range():
    """CO2 below 300 K: Q is rotation-dominated, so Q(T) ~ a*T with a small
    vibrational correction — the anchored ratio at 200 K must sit within a
    percent of the published TIPS ratio (~0.632)."""
    r = float(tips.q_of_T(2, 1, 200.0) / tips.q_of_T(2, 1, 296.0))
    assert abs(r - 0.632) < 0.01, r


def test_register_override():
    temps = np.linspace(50, 1000, 20)
    vals = 2.0 * np.interp(temps, tips.T_GRID, tips.q_table(5, 1))
    tips.register_q_table(5, 3, temps, vals)
    try:
        q = tips.q_of_T(5, 3, 296.0)
        np.testing.assert_allclose(q, 2.0 * tips.q_of_T(5, 1, 296.0), rtol=5e-3)
    finally:
        tips._REGISTERED.pop((5, 3), None)
        tips._CACHE.pop((5, 3), None)


def test_pack_tables_shape():
    t = tips.pack_q_tables([(2, 1), (5, 1), (1, 1)])
    assert t.shape == (3, tips.T_GRID.shape[0])
    assert np.all(t > 0)


def test_out_of_grid_warns():
    with pytest.warns(UserWarning, match="outside the table grid"):
        tips.q_of_T(2, 1, 10.0)
    with pytest.warns(UserWarning, match="outside the table grid"):
        tips.q_of_T(2, 1, 2000.0)


def test_unknown_iso_fallback_warns():
    with pytest.warns(UserWarning, match="main isotopologue"):
        tips.q_table(5, 98)
    with pytest.raises(KeyError):
        tips.q_table(99, 1)
