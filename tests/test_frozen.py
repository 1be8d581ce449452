"""Frozen-orbital reduction tests (exact identities)."""

import numpy as np

from nbed_tpu.driver import NbedDriver, run_emb_fci
from nbed_tpu.ham import HamiltonianBuilder, reduce_virtuals
from nbed_tpu.solvers import run_fci
from nbed_tpu.solvers.frozen import freeze_spinorbitals

import pytest

pytestmark = pytest.mark.slow  # driver/compile-heavy; smoke tier = -m 'not slow'


def test_frozen_virtuals_match_reduced_space(water_uhf):
    """Freezing the top virtual == building on the virtual-reduced SCF."""
    e_frozen = run_emb_fci(water_uhf, frozen=[6])
    reduced = reduce_virtuals(water_uhf, 1)
    const, h1, h2 = HamiltonianBuilder(reduced, 0.0).build()
    vals, _ = run_fci(const, h1, h2, h1.shape[0], (5, 5))
    e_reduced = float(vals[0]) + water_uhf.energy_nuc()
    assert np.isclose(e_frozen, e_reduced, atol=1e-9)


def test_freezing_all_occupied_yields_mean_field_energy(water_uhf):
    """Folding every occupied orbital reproduces the SCF electronic energy."""
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0.0).build()
    occ_mask = NbedDriver._interleaved_occ(water_uhf)
    frozen = list(np.nonzero(occ_mask)[0])
    e_shift, h1r, h2r, occ_red = freeze_spinorbitals(const, h1, h2, frozen,
                                                     occ_mask)
    assert not occ_red.any()
    e_elec_scf = water_uhf.e_tot - water_uhf.energy_nuc()
    assert np.isclose(e_shift, e_elec_scf, atol=1e-8)


def test_frozen_core_fci_close_to_full(water_uhf):
    """Freezing the O 1s core changes the FCI energy only slightly."""
    e_full = run_emb_fci(water_uhf)
    e_frozen_core = run_emb_fci(water_uhf, frozen=[0])
    assert abs(e_full - e_frozen_core) < 5e-3
    assert e_frozen_core > e_full - 1e-10  # variational in the smaller space


def test_builder_n_frozen_core_wired(water_uhf):
    """HamiltonianBuilder(n_frozen_core=k) folds the core exactly: the
    built Hamiltonian shrinks by 2k spin orbitals and its spectrum matches
    the explicit freeze_spinorbitals route (the reference accepts
    n_frozen_core but never applies it, reference ham_builder.py:24,227)."""
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0.0, n_frozen_core=1).build()
    assert h1.shape[0] == 12  # 14 spin orbitals - 2 frozen core
    vals, _ = run_fci(const, h1, h2, h1.shape[0], (4, 4))
    e_builder = float(vals[0]) + water_uhf.energy_nuc()
    e_ref = run_emb_fci(water_uhf, frozen=[0])
    assert np.isclose(e_builder, e_ref, atol=1e-10)


def test_builder_n_frozen_core_rejects_virtuals(water_uhf):
    """Freezing more spatial orbitals than are occupied must raise."""
    from nbed_tpu.exceptions import HamiltonianBuilderError

    with pytest.raises(HamiltonianBuilderError):
        HamiltonianBuilder(water_uhf, 0.0, n_frozen_core=6).build()
