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


def test_bse_json_basis_roundtrip(tmp_path, water_xyz):
    """A Basis Set Exchange JSON file reproduces the bundled table exactly
    (the escape hatch to arbitrary bases, reference driver.py:96-102)."""
    import json

    from nbed_tpu.chem.basis import get_element_shells

    elements = {}
    for sym, z in (("O", 8), ("H", 1)):
        shells = get_element_shells("sto-3g", sym)
        elements[str(z)] = {"electron_shells": [
            {"angular_momentum": [l],
             "exponents": [repr(e) for e, _ in prims],
             "coefficients": [[repr(c) for _, c in prims]]}
            for l, prims in shells
        ]}
    path = tmp_path / "mybasis.json"
    path.write_text(json.dumps({"elements": elements}))

    a = build_molecule(water_xyz, "sto-3g")
    b = build_molecule(water_xyz, str(path))
    assert a.nao == b.nao
    for sa, sb in zip(a.shells, b.shells):
        assert sa.l == sb.l and sa.atom == sb.atom
        assert np.allclose(sa.exps, sb.exps) and np.allclose(sa.coeffs, sb.coeffs)
