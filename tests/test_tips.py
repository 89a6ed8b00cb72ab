"""Partition sums (component C2).

Only RATIOS Q(296)/Q(T) enter line-strength scaling, so constant nuclear-spin
degeneracy factors (present in official TIPS, absent in the RRHO model)
cancel; tests therefore check absolute values only for g_ns = 1 species.
"""

import numpy as np

from spectrobot_tpu.data import tips


def test_co2_q296_matches_tips():
    # Official TIPS: Q(296) = 286.09 for CO2 626 (g_ns = 1).
    q = tips.q_of_T(2, 1, 296.0)
    assert abs(q - 286.09) / 286.09 < 0.02, q


def test_co_q296_matches_tips():
    # Official TIPS: Q(296) = 107.12 for CO 26.
    q = tips.q_of_T(5, 1, 296.0)
    assert abs(q - 107.12) / 107.12 < 0.02, q


def test_q_monotone_increasing():
    for key in [(2, 1), (5, 1), (1, 1), (6, 1)]:
        q = tips.q_table(*key)
        assert np.all(np.diff(q) > 0)


def test_ratio_sane():
    # Q(296)/Q(T) < 1 for T > 296 and > 1 for T < 296.
    for key in [(2, 1), (1, 1)]:
        q296 = tips.q_of_T(*key, 296.0)
        assert q296 / tips.q_of_T(*key, 500.0) < 1.0
        assert q296 / tips.q_of_T(*key, 150.0) > 1.0


def test_register_override():
    temps = np.linspace(50, 1000, 20)
    vals = 2.0 * np.interp(temps, tips.T_GRID, tips.q_table(5, 1))
    tips.register_q_table(5, 3, temps, vals)
    try:
        q = tips.q_of_T(5, 3, 296.0)
        np.testing.assert_allclose(q, 2.0 * tips.q_of_T(5, 1, 296.0), rtol=5e-3)
    finally:
        tips._REGISTERED.pop((5, 3), None)


def test_pack_tables_shape():
    t = tips.pack_q_tables([(2, 1), (5, 1), (1, 1)])
    assert t.shape == (3, tips.T_GRID.shape[0])
    assert np.all(t > 0)
