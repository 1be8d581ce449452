"""Property layer (dipoles, populations): exact internal identities plus
loose physical windows — no external oracle needed (the reference has no
property API; PySCF is absent in this image)."""

from pathlib import Path

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.properties import (
    atomic_spin_densities,
    dipole_moment,
    lowdin_charges,
    lowdin_populations,
    mulliken_charges,
    mulliken_populations,
)
from nbed_tpu.scf.engine import SCFEngine

MOLDIR = Path(__file__).parent / "molecules"


def _hf(xyz_file, charge=0, spin=0, **kw):
    xyz = (MOLDIR / xyz_file).read_text()
    mol = build_molecule(xyz, "sto-3g", charge=charge, spin=spin)
    return SCFEngine(mol, conv_tol=1e-10, dm_conv_tol=1e-8, **kw).kernel()


@pytest.fixture(scope="module")
def water_hf():
    return _hf("water.xyz")


def test_h2_dipole_is_zero():
    sol = _hf("h2.xyz")
    d = dipole_moment(sol, unit="au")
    np.testing.assert_allclose(d, 0.0, atol=1e-8)


def test_water_dipole_window_and_origin_independence(water_hf):
    d0 = dipole_moment(water_hf, unit="debye")
    # HF/STO-3G water dipole is ~1.7 D; assert a generous physical window
    assert 1.2 < np.linalg.norm(d0) < 2.2
    # neutral system: exact origin independence
    d1 = dipole_moment(water_hf, origin=(1.7, -0.3, 2.5), unit="debye")
    np.testing.assert_allclose(d0, d1, atol=1e-10)


def test_cation_dipole_origin_shift():
    sol = _hf("water.xyz", charge=1, spin=1)
    origin = np.array([0.5, -1.0, 2.0])
    d0 = dipole_moment(sol, unit="au")
    d1 = dipole_moment(sol, origin=origin, unit="au")
    # charge q=+1: d(origin) = d(0) - q*origin exactly
    np.testing.assert_allclose(d1, d0 - origin, atol=1e-10)


def test_population_sums(water_hf):
    mol = water_hf.mol
    n_el = sum(water_hf.nelec)
    for pops in (mulliken_populations(water_hf), lowdin_populations(water_hf)):
        assert pops.shape == (mol.natm,)
        np.testing.assert_allclose(pops.sum(), n_el, atol=1e-8)
    for charges in (mulliken_charges(water_hf), lowdin_charges(water_hf)):
        np.testing.assert_allclose(charges.sum(), mol.charge, atol=1e-8)
    # oxygen pulls density: negative charge on atom 0 (O), positive on H
    q = mulliken_charges(water_hf)
    assert q[0] < 0 < q[1]


def test_spin_densities_doublet():
    sol = _hf("water.xyz", charge=1, spin=1)
    for scheme in ("mulliken", "lowdin"):
        sd = atomic_spin_densities(sol, scheme=scheme)
        np.testing.assert_allclose(sd.sum(), 1.0, atol=1e-8)
    sd_closed = atomic_spin_densities(_hf("h2.xyz"))
    np.testing.assert_allclose(sd_closed, 0.0, atol=1e-10)
    with pytest.raises(ValueError):
        atomic_spin_densities(sol, scheme="bogus")


def test_cube_files(water_hf, tmp_path):
    """Cube export: the density integrates to n_electrons, an occupied MO
    to unit norm, and the header follows the Gaussian cube layout."""
    from nbed_tpu.properties import density_cube, mo_cube

    dens_path = tmp_path / "rho.cube"
    vals = density_cube(water_hf, dens_path, spacing=0.35, margin=5.0)
    dv = 0.35 ** 3
    n_el = sum(water_hf.nelec)
    # core density is cusp-limited at this spacing: measured 7.8%
    # riemann-sum error (the Becke-grid integral of the same field is
    # 10.0000003 — the field is exact, the lattice is coarse)
    assert abs(vals.sum() * dv - n_el) / n_el < 0.1
    assert vals.min() >= 0.0

    mo_path = tmp_path / "homo.cube"
    n_occ = water_hf.nelec[0]
    mvals = mo_cube(water_hf, n_occ - 1, mo_path, spacing=0.35, margin=5.0)
    assert abs((mvals ** 2).sum() * dv - 1.0) < 0.05

    lines = dens_path.read_text().splitlines()
    natm = int(lines[2].split()[0])
    assert natm == water_hf.mol.natm
    shape = [int(lines[3 + d].split()[0]) for d in range(3)]
    assert tuple(shape) == vals.shape
    # atom block: Z, charge, x, y, z per atom
    assert len(lines[6].split()) == 5
