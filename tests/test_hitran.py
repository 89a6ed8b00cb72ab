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


# ---------------------------------------------------------------------------
# Genuine-format fixtures + loud error paths (VERDICT r3 item 5)
# ---------------------------------------------------------------------------
# These records are HAND-ASSEMBLED in the authentic HITRAN 2004 160-char
# layout — chunk by chunk, each width asserted below — NOT produced by this
# repo's format_par_record writer, so the parser is exercised on data it
# did not generate.  They carry the format quirks real catalogs have:
# no-leading-zero gammas (".0691"), Fortran " .64" exponents, blank
# optional fields, negative pressure shifts.  Parameter values are
# literature-plausible for well-known lines (CO2 626 nu2 Q(6) near
# 667.4 cm-1, CO 1-0 R(0) at 2147.0811 cm-1, an H2O nu2 line); the
# assertions verify FIELD EXTRACTION against independent hand-decoding of
# the columns (the physics values themselves are fixture data — the real
# database is not downloadable in this image).

def _chunks(*parts_widths):
    rec = ""
    for part, width in parts_widths:
        assert len(part) == width, (part, len(part), width)
        rec += part
    assert len(rec) == 160, len(rec)
    return rec


REC_CO2_Q6 = _chunks(
    (" 2", 2), ("1", 1),
    ("  667.379000", 12),     # nu F12.6
    (" 1.540E-23", 10),       # sw E10.3
    (" 4.690E-07", 10),       # Einstein A
    (".0691", 5),             # gamma_air, HITRAN no-leading-zero style
    (".0873", 5),             # gamma_self
    ("  234.0834", 10),       # E'' F10.4
    ("0.78", 4),              # n_air
    ("-.000072", 8),          # delta_air, negative no-leading-zero
    ("       0 1 1 01", 15),  # global quanta upper
    ("       0 0 0 01", 15),  # global quanta lower
    ("               ", 15),  # local quanta upper (blank for CO2 Q)
    ("          Q  6e", 15),  # local quanta lower
    ("346664 5 4 2 2 1 0", 18),  # ierr/iref codes
    (" ", 1),
    ("   13.0", 7), ("   11.0", 7),
)

REC_CO_R0 = _chunks(
    (" 5", 2), ("1", 1),
    (" 2147.081133", 12),
    (" 4.518E-19", 10),
    (" 3.370E+01", 10),
    (".0782", 5), (".0840", 5),
    ("    0.0000", 10),
    ("0.77", 4),
    ("-.002280", 8),
    ("              1", 15), ("              0", 15),
    ("               ", 15), ("      R  0     ", 15),
    ("455664 5 5 3 2 1 0", 18),
    (" ", 1),
    ("    3.0", 7), ("    1.0", 7),
)

REC_H2O = _chunks(
    (" 1", 2), ("1", 1),
    (" 1554.353000", 12),
    (" 1.010E-21", 10),
    (" 7.500E-01", 10),
    (".0980", 5), (".4600", 5),
    ("  142.2785", 10),
    (" .64", 4),               # Fortran blank-leading exponent
    ("        ", 8),           # blank delta_air (legitimate optional)
    ("       0 1 0   ", 15), ("       0 0 0   ", 15),
    ("  5  2  4      ", 15), ("  4  1  3      ", 15),
    ("577764 5 2 2 1 0  ", 18),
    (" ", 1),
    ("   33.0", 7), ("   27.0", 7),
)

GENUINE_PAR = "\n".join([REC_CO_R0, REC_CO2_Q6, REC_H2O])  # deliberately unsorted


def test_genuine_format_records_parse():
    ll = parse_par_text(GENUINE_PAR, use_native="never")
    assert len(ll) == 3
    # Sorted ascending by nu0 regardless of input order (C1 invariant).
    np.testing.assert_allclose(ll.nu0, [667.379, 1554.353, 2147.081133])
    assert list(ll.mol_id) == [2, 1, 5]
    assert list(ll.iso_id) == [1, 1, 1]
    np.testing.assert_allclose(ll.sw, [1.540e-23, 1.010e-21, 4.518e-19])
    np.testing.assert_allclose(ll.a_einstein, [4.690e-07, 0.750, 33.70])
    np.testing.assert_allclose(ll.gamma_air, [0.0691, 0.0980, 0.0782])
    np.testing.assert_allclose(ll.gamma_self, [0.0873, 0.4600, 0.0840])
    np.testing.assert_allclose(ll.elower, [234.0834, 142.2785, 0.0])
    np.testing.assert_allclose(ll.n_air, [0.78, 0.64, 0.77])
    np.testing.assert_allclose(ll.delta_air, [-0.000072, 0.0, -0.002280])
    np.testing.assert_allclose(ll.gp, [13.0, 33.0, 3.0])
    np.testing.assert_allclose(ll.gpp, [11.0, 27.0, 1.0])
    # Quanta strings preserved verbatim (modulo fixed-width padding).
    assert ll.quanta_global_u[0].strip() == "0 1 1 01"
    assert ll.quanta_local_l[0].strip() == "Q  6e"
    assert ll.quanta_local_u[0].strip() == ""
    assert ll.quanta_local_l[2].strip() == "R  0"
    # Registry masses denormalised per line.
    np.testing.assert_allclose(ll.mass_amu, [43.98983, 18.01056, 27.99491],
                               atol=1e-4)


def test_genuine_records_native_parity():
    from spectrobot_tpu.data import hitran_native
    import pytest
    if not hitran_native.available():
        pytest.skip("native parser not built")
    a = parse_par_text(GENUINE_PAR, use_native="never")
    b = parse_par_text(GENUINE_PAR, use_native="always")
    for f in ("nu0", "sw", "a_einstein", "gamma_air", "gamma_self",
              "elower", "n_air", "delta_air", "gp", "gpp"):
        np.testing.assert_allclose(getattr(b, f), getattr(a, f), rtol=1e-14,
                                   err_msg=f)
    assert list(b.mol_id) == list(a.mol_id)
    assert list(b.iso_id) == list(a.iso_id)
    for f in ("quanta_global_u", "quanta_local_l"):
        assert [s.strip() for s in getattr(b, f)] == \
               [s.strip() for s in getattr(a, f)]


def test_truncated_record_rejected():
    import pytest
    with pytest.raises(ValueError, match="line 2.*chars"):
        parse_par_text(REC_CO2_Q6 + "\n 21  667.379000 1.540E-23\n",
                       use_native="never")


def test_blank_nu_field_rejected():
    import pytest
    bad = REC_CO2_Q6[:3] + " " * 12 + REC_CO2_Q6[15:]
    with pytest.raises(ValueError, match="nu0"):
        parse_par_text(bad, use_native="never")
    from spectrobot_tpu.data import hitran_native
    if hitran_native.available():
        with pytest.raises(ValueError, match="nu0"):
            parse_par_text(bad, use_native="always")


def test_zero_intensity_rejected():
    import pytest
    bad = REC_CO2_Q6[:15] + " 0.000E+00" + REC_CO2_Q6[25:]
    with pytest.raises(ValueError, match="sw"):
        parse_par_text(bad, use_native="never")


def test_garbage_numeric_field_rejected():
    import pytest
    bad = REC_CO2_Q6[:3] + "  66X.379000" + REC_CO2_Q6[15:]
    with pytest.raises(ValueError, match="non-numeric"):
        parse_par_text(bad, use_native="never")


def test_unknown_molecule_rejected():
    import pytest
    bad = "99" + REC_CO2_Q6[2:]
    with pytest.raises(KeyError, match="unknown HITRAN species"):
        parse_par_text(bad, use_native="never")
