"""FCI and CCSD reference solvers vs the reference's PySCF oracles."""

import numpy as np

from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.solvers import run_ccsd, run_fci

import pytest

pytestmark = pytest.mark.slow  # driver/compile-heavy; smoke tier = -m 'not slow'


def _interleaved_occ(sol):
    occ = np.asarray(sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])
    k = occ.shape[-1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[::2] = occ[0] > 0
    mask[1::2] = occ[1] > 0
    return mask


def test_global_fci_oracle(water_uhf):
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    vals, _ = run_fci(const, h1, h2, 14, (5, 5))
    # reference tests/test_driver.py:76
    assert np.isclose(vals[0] + water_uhf.energy_nuc(), -75.00912605315143,
                      atol=1e-7)


def test_global_ccsd_oracle(water_uhf):
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    e_corr, e_ref = run_ccsd(h1, h2, _interleaved_occ(water_uhf), conv_tol=1e-10)
    # reference tests/test_driver.py:68-69
    assert np.isclose(e_corr, -0.04801281045273269, atol=1e-7)
    e_tot = e_ref + water_uhf.energy_nuc() + e_corr
    assert np.isclose(e_tot, -75.0090124134578, atol=1e-7)
    # mean-field energy implied by the integrals must equal the SCF energy
    assert np.isclose(e_ref + water_uhf.energy_nuc(), water_uhf.e_tot, atol=1e-8)


def test_ccsd_equals_fci_for_two_electrons():
    """For 2 electrons CCSD is exact: compare on H2."""
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule("2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.7408481486\n", "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10).kernel()
    const, h1, h2 = HamiltonianBuilder(sol, 0).build()
    vals, _ = run_fci(const, h1, h2, 4, (1, 1))
    e_corr, e_ref = run_ccsd(h1, h2, _interleaved_occ(sol), conv_tol=1e-12)
    assert np.isclose(e_ref + e_corr, vals[0], atol=1e-9)


def test_ccsd_mixed_precision_matches_f64(water_uhf):
    """The f32-sweep + f64-polish path lands on the same fixed point."""
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ = _interleaved_occ(water_uhf)
    e64, _ = run_ccsd(h1, h2, occ, conv_tol=1e-10, precision="f64")
    emix, _ = run_ccsd(h1, h2, occ, conv_tol=1e-10, precision="mixed")
    assert abs(emix - e64) < 1e-8
    # the f32 sweep alone must already be ~1e-5-grade (seeding quality)
    e32, _ = run_ccsd(h1, h2, occ, conv_tol=1e-10, precision="f32")
    assert abs(e32 - e64) < 5e-5


def test_ccsd_t_vanishes_for_two_electrons():
    """No triples exist for 2 electrons: (T) must be identically zero,
    a sharp check of the P(i/jk)/P(a/bc) permutational structure."""
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule("2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.74\n", "6-31g")
    sol = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10).kernel()
    const, h1, h2 = HamiltonianBuilder(sol, 0).build()
    e_corr, e_t, e_ref = run_ccsd(h1, h2, _interleaved_occ(sol),
                                  conv_tol=1e-12, triples=True,
                                  precision="f64")
    assert abs(e_t) < 1e-14


def test_ccsd_t_improves_on_ccsd_vs_fci():
    """LiH/STO-3G: (T) must close most of the CCSD-FCI gap."""
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule("2\n\nLi 0.0 0.0 0.0\nH 0.0 0.0 1.60\n", "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10).kernel()
    const, h1, h2 = HamiltonianBuilder(sol, 0).build()
    vals, _ = run_fci(const, h1, h2, h1.shape[0], (2, 2))
    e_corr, e_t, e_ref = run_ccsd(h1, h2, _interleaved_occ(sol),
                                  conv_tol=1e-12, triples=True,
                                  precision="f64")
    err_ccsd = abs(e_ref + e_corr - vals[0])
    err_t = abs(e_ref + e_corr + e_t - vals[0])
    assert err_t < 0.35 * err_ccsd  # measured: 1.06e-5 -> 2.1e-6
    assert err_t < 5e-6


def test_ccsd_t_water_vs_fci_oracle(water_uhf):
    """Water/STO-3G full space: CCSD(T) total sits between CCSD and the
    reference FCI oracle (CCSD err 1.14e-4 -> CCSD(T) err 4.6e-5)."""
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    e_corr, e_t, e_ref = run_ccsd(h1, h2, _interleaved_occ(water_uhf),
                                  conv_tol=1e-10, triples=True,
                                  precision="f64")
    fci = -75.00912605315143  # reference tests/test_driver.py:76
    e_nuc = water_uhf.energy_nuc()
    err_ccsd = abs(e_ref + e_nuc + e_corr - fci)
    err_t = abs(e_ref + e_nuc + e_corr + e_t - fci)
    assert e_t < 0  # (T) lowers the energy here
    assert err_t < 0.5 * err_ccsd


def test_mp2_between_zero_and_fci(water_uhf):
    """Water/STO-3G: MP2 recovers a large fraction of (but not more than)
    the FCI correlation, and is consistent with the same reference energy
    as CCSD."""
    from nbed_tpu.solvers import run_mp2

    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ = _interleaved_occ(water_uhf)
    e_mp2, e_ref = run_mp2(h1, h2, occ)
    e_corr_fci = -75.00912605315143 - (e_ref + water_uhf.energy_nuc())
    assert e_mp2 < 0
    assert 0.5 * abs(e_corr_fci) < abs(e_mp2) < abs(e_corr_fci)
    # MP2 == the CCSD initial doubles energy: both solvers must agree on
    # the mean-field reference
    e_ccsd, e_ref_ccsd = run_ccsd(h1, h2, occ, conv_tol=1e-10)
    assert np.isclose(e_ref, e_ref_ccsd, atol=1e-10)
