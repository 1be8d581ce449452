"""Molecule / basis layer tests (nao, electrons, AO slices, normalization)."""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.integrals import overlap


def test_water_structure(water_molecule):
    assert water_molecule.nao == 7
    assert water_molecule.nelec == (5, 5)
    assert water_molecule.natm == 3
    slices = water_molecule.aoslice_by_atom()
    assert slices[0].tolist() == [0, 3, 0, 5]  # O: 1s 2s 2p
    assert slices[-1, 3] == 7


def test_nuclear_repulsion_oracle(water_molecule):
    # reference tests/test_driver.py:56
    assert np.isclose(float(water_molecule.energy_nuc()), 9.285714221677825,
                      atol=1e-10)


@pytest.mark.parametrize("basis,nao", [("sto-3g", 7), ("6-31g", 13),
                                       ("cc-pvdz", 24)])
def test_ao_normalization(water_xyz, basis, nao):
    mol = build_molecule(water_xyz, basis)
    assert mol.nao == nao
    s = np.asarray(overlap(mol))
    assert np.allclose(np.diag(s), 1.0, atol=1e-12)
    assert np.allclose(s, s.T, atol=1e-14)


def test_charged_molecule(water_xyz):
    cation = build_molecule(water_xyz, "sto-3g", charge=1, spin=1)
    assert cation.nelec == (5, 4)
    with pytest.raises(ValueError):
        build_molecule(water_xyz, "sto-3g", charge=1, spin=0).nelec


def test_unknown_basis_and_element(water_xyz):
    with pytest.raises(KeyError):
        build_molecule(water_xyz, "not-a-basis")
    with pytest.raises(KeyError):
        build_molecule("1\n\nNa 0.0 0.0 0.0\n", "sto-3g")


def test_electron_override(water_molecule):
    emb = water_molecule.with_nelec((3, 3))
    assert emb.nelectron == 6
    assert emb.nelec == (3, 3)
    # original untouched
    assert water_molecule.nelec == (5, 5)
