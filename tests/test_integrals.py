"""Integral engine tests: closed-form oracles and tensor symmetries."""

import numpy as np
import pytest
from scipy.special import erf

from nbed_tpu.chem import build_molecule
from nbed_tpu.chem.periodic import BOHR_IN_ANGSTROM
from nbed_tpu.integrals import (
    dipole_integrals,
    eri_tensor,
    kinetic,
    nuclear_attraction,
    overlap,
    overlap_cross,
)

H2_XYZ = f"2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 {1.4 * BOHR_IN_ANGSTROM:.12f}\n"


def _f0(t):
    t = np.asarray(t, float)
    out = np.ones_like(t)
    m = t > 1e-12
    out[m] = 0.5 * np.sqrt(np.pi / t[m]) * erf(np.sqrt(t[m]))
    return out


def _exact_s_integrals(mol):
    """Closed-form s-only overlap/kinetic/nuclear/ERI reference."""
    sh = mol.shells
    centers = [mol.coords[s.atom] for s in sh]
    exps = [np.array(s.exps) for s in sh]
    coefs = [np.array(s.coeffs) * np.array(s.cart2sph)[0, 0] for s in sh]
    ns = len(sh)
    s_mat = np.zeros((ns, ns))
    t_mat = np.zeros((ns, ns))
    v_mat = np.zeros((ns, ns))
    for i in range(ns):
        for j in range(ns):
            avec, bvec = centers[i], centers[j]
            r2 = np.sum((avec - bvec) ** 2)
            for a, ca in zip(exps[i], coefs[i]):
                for b, cb in zip(exps[j], coefs[j]):
                    p = a + b
                    pre = np.exp(-a * b / p * r2)
                    s0 = (np.pi / p) ** 1.5 * pre
                    s_mat[i, j] += ca * cb * s0
                    t_mat[i, j] += ca * cb * (a * b / p) * (3 - 2 * a * b / p * r2) * s0
                    pp = (a * avec + b * bvec) / p
                    for c_at, z in zip(mol.coords, mol.atom_charges):
                        v_mat[i, j] += (
                            -z * ca * cb * 2 * np.pi / p * pre
                            * _f0(p * np.sum((pp - c_at) ** 2))
                        )
    return s_mat, t_mat, v_mat


def test_s_integrals_exact():
    mol = build_molecule(H2_XYZ, "sto-3g")
    s_ref, t_ref, v_ref = _exact_s_integrals(mol)
    assert np.allclose(np.asarray(overlap(mol)), s_ref, atol=1e-14)
    assert np.allclose(np.asarray(kinetic(mol)), t_ref, atol=1e-14)
    assert np.allclose(np.asarray(nuclear_attraction(mol)), v_ref, atol=1e-13)


def test_eri_symmetries(water_molecule):
    eri = np.asarray(eri_tensor(water_molecule))
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3), atol=1e-13)
    assert np.allclose(eri, eri.transpose(0, 1, 3, 2), atol=1e-13)
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1), atol=1e-13)


def test_cross_overlap_consistency(water_molecule):
    """Cross overlap of a molecule with itself equals the overlap matrix."""
    s = np.asarray(overlap(water_molecule))
    s_cross = np.asarray(overlap_cross(water_molecule, water_molecule))
    assert np.allclose(s, s_cross, atol=1e-13)


def test_dipole_symmetric(water_molecule):
    d = np.asarray(dipole_integrals(water_molecule))
    assert d.shape == (3, 7, 7)
    for k in range(3):
        assert np.allclose(d[k], d[k].T, atol=1e-13)


@pytest.mark.slow
def test_eri_d_functions_vs_native():
    """JAX-path ERIs with d functions (cc-pVDZ) match the native engine.

    Regression for the d-class trace blowup: the angular-class/flat-primitive
    design plus the vectorised Hermite R build must trace and run this in
    seconds, unblocking vmapped-conformer workflows on d bases.
    """
    from nbed_tpu import native
    from nbed_tpu.integrals.eri import _angular_classes

    if not native.available():
        pytest.skip("native engine unavailable")
    mol = build_molecule("1\n\nO 0.0 0.0 0.0", "cc-pvdz")
    assert len(_angular_classes(mol)) <= 21
    a = np.asarray(eri_tensor(mol))
    b = native.eri(mol, np.asarray(mol.coords))
    assert np.abs(a - b).max() < 1e-12
