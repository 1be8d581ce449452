"""SCF engine tests: reference-oracle energies + Huzinaga SCF behaviour.

Oracle values are the reference test suite's hard-coded PySCF numbers
(reference tests/test_driver.py:41-80, BASELINE.md). HF oracles are exact
(<1e-8); DFT oracles are grid-limited (~2e-7 with our default grid).
"""

import numpy as np
import pytest

from nbed_tpu.scf import huzinaga_scf


def test_uhf_oracle(water_uhf, water_uhf_engine):
    assert np.isclose(water_uhf.e_tot, -74.96099960129165, atol=5e-8)
    e_elec, e_coul = water_uhf.energy_elec()
    assert np.isclose(e_elec, -84.24671382296947, atol=5e-8)
    assert np.isclose(e_coul, 38.288174841671974, atol=5e-8)
    assert water_uhf.converged


def test_rhf_matches_uhf(water_rhf, water_uhf):
    assert np.isclose(water_rhf.e_tot, water_uhf.e_tot, atol=1e-9)
    assert np.asarray(water_rhf.mo_coeff).ndim == 2
    assert np.allclose(water_rhf.mo_occ, [2, 2, 2, 2, 2, 0, 0])


def test_uks_b3lyp_oracle(water_uks):
    # reference tests/test_driver.py:45-49 — grid-limited agreement
    assert np.isclose(water_uks.e_tot, -75.3091447400438, atol=5e-6)
    e_elec, e2 = water_uks.energy_elec()
    assert np.isclose(e_elec, -84.59485896172163, atol=5e-6)
    assert np.isclose(e2, 37.93302591280513, atol=5e-6)


def test_restricted_dm_is_total(water_rhf):
    dm = water_rhf.make_rdm1()
    assert dm.ndim == 2
    s = np.asarray(water_rhf.engine.s)
    assert np.isclose(np.trace(dm @ s), 10.0, atol=1e-8)


@pytest.fixture(scope="module")
def dft_potential(spinless_driver):
    return spinless_driver.embedding_potential


@pytest.fixture(scope="module")
def dm_environment(spinless_driver):
    return spinless_driver.localized_system.dm_enviro


def test_huzinaga_rhf(water_rhf_engine, dft_potential, dm_environment):
    """Reference tests/test_scf.py:77-99 (restricted HF, O-active water)."""
    mo_coeff, mo_energy, dm, huz, conv = huzinaga_scf(
        water_rhf_engine,
        embedding_potential=dft_potential[0],
        dm_environment_occupied=dm_environment[0],
    )
    assert mo_coeff.shape == (7, 7)
    # grid-limited parity with the PySCF-based oracle mo energies
    assert np.allclose(
        mo_energy,
        [-19.346243, -0.59741322, 0.12747464, 0.6132579, 0.79561917,
         3.56833278, 4.1655741],
        atol=2e-4,
    )
    assert dm.shape == (7, 7)
    assert np.isclose(np.mean(dm), 0.17985591319811933, atol=1e-5)
    assert np.isclose(np.mean(huz), -0.01224642921175508, atol=1e-5)
    assert conv


def test_huzinaga_uhf(water_uhf_engine, dft_potential, dm_environment):
    """Reference tests/test_scf.py:102-134 (unrestricted HF)."""
    mo_coeff, mo_energy, dm, huz, conv = huzinaga_scf(
        water_uhf_engine,
        embedding_potential=dft_potential,
        dm_environment_occupied=dm_environment,
    )
    assert mo_coeff.shape == (2, 7, 7)
    assert np.allclose(
        mo_energy[0],
        [-19.18005207, -0.618383, 0.07366692, 0.39496279, 0.72192366,
         2.44806433, 4.12874389],
        atol=2e-4,
    )
    assert np.isclose(np.mean(dm), 0.0920247346776863, atol=1e-5)
    assert np.isclose(np.mean(huz), -0.024315876434944768, atol=1e-5)
    assert conv


def test_huzinaga_rks(water_rks_engine, dft_potential, dm_environment):
    """Reference tests/test_scf.py:19-48 (restricted KS)."""
    mo_coeff, mo_energy, dm, huz, conv = huzinaga_scf(
        water_rks_engine,
        embedding_potential=dft_potential[0],
        dm_environment_occupied=dm_environment[0],
    )
    assert mo_coeff.shape == (7, 7)
    assert np.allclose(
        mo_energy,
        [-17.44629099, -0.27614116, 0.37893061, 0.89022282, 1.12092664,
         3.32762378, 3.86532114],
        atol=2e-4,
    )
    assert np.isclose(np.mean(dm), 0.1822057642580939, atol=1e-5)
    assert np.isclose(np.mean(huz), -0.011214890666261626, atol=1e-5)
    assert conv


def test_huzinaga_uks(water_uks_engine, dft_potential, dm_environment):
    """Reference tests/test_scf.py:51-74 (unrestricted KS)."""
    mo_coeff, mo_energy, dm, huz, conv = huzinaga_scf(
        water_uks_engine,
        embedding_potential=dft_potential,
        dm_environment_occupied=dm_environment,
    )
    assert mo_coeff.shape == (2, 7, 7)
    assert np.allclose(
        mo_energy[0],
        [-17.29060406, -0.28451256, 0.31504139, 0.60348835, 1.0520797,
         2.22020625, 3.8346852],
        atol=2e-4,
    )
    assert np.isclose(np.mean(dm), 0.09276688041715254, atol=1e-5)
    assert np.isclose(np.mean(huz), -0.02251188710459783, atol=1e-5)
    assert conv
