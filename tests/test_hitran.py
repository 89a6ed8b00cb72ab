"""HITRAN .par parsing and LineList plumbing (component C1)."""

import numpy as np

from spectrobot_tpu.data.hitran import (
    LineList, format_par_record, parse_par_text,
)
from spectrobot_tpu.data.synth import co2_15um_band, random_lines


def test_par_round_trip_fields():
    rec = format_par_record(
        mol_id=2, iso_id=1, nu0=667.380123, sw=3.456e-19, a=1.234,
        gamma_air=0.0712, gamma_self=0.0934, elower=234.5678, n_air=0.69,
        delta_air=-0.00123, gq_u="0110", gq_l="0000", lq_u="P12", lq_l="R11",
        gp=25.0, gpp=23.0,
    )
    assert len(rec) == 160
    ll = parse_par_text(rec)
    assert len(ll) == 1
    assert ll.mol_id[0] == 2 and ll.iso_id[0] == 1
    np.testing.assert_allclose(ll.nu0[0], 667.380123, atol=1e-6)
    np.testing.assert_allclose(ll.sw[0], 3.456e-19, rtol=1e-3)
    np.testing.assert_allclose(ll.gamma_air[0], 0.0712, atol=1e-3)
    np.testing.assert_allclose(ll.gamma_self[0], 0.0934, atol=1e-3)
    np.testing.assert_allclose(ll.elower[0], 234.5678, atol=1e-4)
    np.testing.assert_allclose(ll.n_air[0], 0.69, atol=1e-2)
    np.testing.assert_allclose(ll.delta_air[0], -0.00123, atol=1e-5)
    assert ll.quanta_global_u[0].strip() == "0110"
    assert ll.quanta_local_l[0].strip() == "R11"
    np.testing.assert_allclose(ll.gp[0], 25.0)
    # CO2 main isotopologue mass denormalised onto the line
    np.testing.assert_allclose(ll.mass_amu[0], 43.98983, atol=1e-4)


def test_linelist_sorted_and_select():
    ll = co2_15um_band(j_max=30)
    assert np.all(np.diff(ll.nu0) >= 0)
    sub = ll.select(nu_min=660.0, nu_max=670.0, wing_cm1=2.0)
    assert len(sub) > 0
    assert sub.nu0.min() >= 658.0 and sub.nu0.max() <= 672.0
    only_co2 = ll.select(mol_ids=[2])
    assert len(only_co2) == len(ll)
    assert len(ll.select(mol_ids=[5])) == 0


def test_npz_round_trip(tmp_path):
    ll = co2_15um_band(j_max=20)
    p = str(tmp_path / "lines.npz")
    ll.save_npz(p)
    ll2 = LineList.load_npz(p)
    assert len(ll2) == len(ll)
    np.testing.assert_allclose(ll2.nu0, ll.nu0)
    np.testing.assert_allclose(ll2.sw, ll.sw)
    assert ll2.quanta_global_u[0] == ll.quanta_global_u[0]


def test_concat_keeps_sorted():
    a = random_lines(100, 600.0, 700.0, seed=1)
    b = random_lines(100, 650.0, 750.0, seed=2)
    c = a.concat(b)
    assert len(c) == 200
    assert np.all(np.diff(c.nu0) >= 0)


def test_band_generator_statistics():
    ll = co2_15um_band(j_max=40)
    assert len(ll) == 81  # 40 P lines + 41 R lines
    # Band strength normalisation: sum of line strengths = s_band
    np.testing.assert_allclose(ll.sw.sum(), 8.0e-18, rtol=1e-2)


def test_extended_iso_codes():
    # HITRAN CO2 catalogs carry iso codes '0' (10), 'A' (11), 'B' (12).
    base = format_par_record(2, 1, 700.0, 1e-20, 1.0, 0.07, 0.09, 100.0,
                             0.7, -0.002)
    recs = [base[:2] + c + base[3:] for c in "90AB"]
    ll = parse_par_text("\n".join(recs), use_native="never")
    assert list(ll.iso_id) == [9, 10, 11, 12]
    from spectrobot_tpu.data import hitran_native
    if hitran_native.available():
        ll2 = parse_par_text("\n".join(recs), use_native="always")
        assert list(ll2.iso_id) == [9, 10, 11, 12]
