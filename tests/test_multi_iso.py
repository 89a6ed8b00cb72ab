"""Multi-isotopologue handling end to end (C1/C2 parity: per-isotopologue
masses and partition functions flow through staging into the line sum)."""

import jax.numpy as jnp
import numpy as np

from golden import numpy_ref
from spectrobot_tpu.data import tips
from spectrobot_tpu.data.hitran import format_par_record, parse_par_text
from spectrobot_tpu.ops.opacity import cross_sections
from spectrobot_tpu.ops.strengths import device_lines_from_linelist


def _two_iso_list():
    recs = []
    rng = np.random.default_rng(11)
    for i in range(30):
        iso = 1 if i % 2 == 0 else 2
        recs.append(format_par_record(
            mol_id=2, iso_id=iso, nu0=float(660.0 + rng.uniform(0, 10)),
            sw=float(10 ** rng.uniform(-21, -19)), a=1.0,
            gamma_air=0.07, gamma_self=0.09,
            elower=float(rng.uniform(0, 1500)), n_air=0.7,
            delta_air=-0.002, gq_u="X", gq_l="G"))
    return parse_par_text("\n".join(recs))


def test_masses_and_q_tables_per_iso():
    ll = _two_iso_list()
    dl = device_lines_from_linelist(ll, [(2, 1), (2, 2)], dtype=jnp.float64)
    assert dl.n_lines == 30
    m = np.asarray(dl.mass_amu)
    sp = np.asarray(dl.species_idx)
    np.testing.assert_allclose(np.unique(m[sp == 0]), 43.98983, atol=1e-4)
    np.testing.assert_allclose(np.unique(m[sp == 1]), 44.993185, atol=1e-4)
    # Distinct Q tables per isotopologue row.
    q = np.asarray(dl.q_tbl)
    assert q.shape[0] == 2
    assert not np.allclose(q[0], q[1])


def test_multi_iso_cross_section_matches_oracle():
    ll = _two_iso_list()
    dl = device_lines_from_linelist(ll, [(2, 1), (2, 2)], dtype=jnp.float64)
    nu = np.linspace(658.0, 672.0, 1501)
    T, p = 230.0, 120.0
    # Oracle: per-line q_ratio using each line's OWN isotopologue table.
    q_ratio = np.array([
        tips.q_of_T(2, int(iso), 296.0) / tips.q_of_T(2, int(iso), T)
        for iso in ll.iso_id])
    ref_a, _ = numpy_ref.cross_section(nu, ll, T, p, 0.0, q_ratio, cutoff=25.0)
    got_a, _ = cross_sections(jnp.asarray(nu), dl, T, p, variant="weideman",
                              cutoff_cm1=25.0)
    np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=5e-4,
                               atol=ref_a.max() * 1e-9)


def test_dropping_second_iso_changes_spectrum():
    ll = _two_iso_list()
    nu = jnp.asarray(np.linspace(658.0, 672.0, 500))
    both = device_lines_from_linelist(ll, [(2, 1), (2, 2)], dtype=jnp.float64)
    only1 = device_lines_from_linelist(ll, [(2, 1)], dtype=jnp.float64)
    a_both, _ = cross_sections(nu, both, 230.0, 120.0)
    a_one, _ = cross_sections(nu, only1, 230.0, 120.0)
    assert float(jnp.sum(a_both)) > float(jnp.sum(a_one)) * 1.2
