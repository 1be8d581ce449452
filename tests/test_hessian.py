"""Harmonic vibrational analysis: internal identities (TR projection,
translational sum rules, symmetry) plus physical windows for HF/STO-3G
water and H2 — no external oracle (the reference computes no nuclear
derivatives; PySCF is absent in this image)."""

from pathlib import Path

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.solvers import harmonic_frequencies
from nbed_tpu.solvers.gradients import optimize_geometry

pytestmark = pytest.mark.slow  # 6N vmapped SCF+gradient lanes; compile-heavy

MOLDIR = Path(__file__).parent / "molecules"


@pytest.fixture(scope="module")
def water_min():
    """Water optimized to the HF/STO-3G minimum (analytic gradients)."""
    mol = build_molecule((MOLDIR / "water.xyz").read_text(), "sto-3g")
    coords, e, _, converged = optimize_geometry(mol, gtol=1e-6, max_steps=60)
    assert converged
    return mol, coords


def test_water_frequencies(water_min):
    mol, coords = water_min
    freqs, modes, hess = harmonic_frequencies(mol, coords=coords)

    # Cartesian Hessian identities
    np.testing.assert_allclose(hess, hess.T, atol=1e-12)
    # translational sum rule: rows sum to ~0 over atoms (FD noise level)
    blocks = hess.reshape(mol.natm, 3, mol.natm, 3)
    np.testing.assert_allclose(blocks.sum(axis=2), 0.0, atol=5e-6)

    # 6 projected TR modes at ~0, 3 real vibrations, no imaginaries
    assert freqs.shape == (9,)
    tr, vib = freqs[:6], freqs[6:]
    assert np.all(np.abs(tr) < 30.0)  # cm^-1, FD/optimization noise
    assert np.all(vib > 0)
    # HF/STO-3G water: bend ~2170 cm^-1, stretches ~4140/4390 cm^-1
    assert 1700 < vib[0] < 2700
    assert 3500 < vib[1] < 4900
    assert 3500 < vib[2] < 4900
    assert vib[1] < vib[2]
    # modes are orthonormal
    np.testing.assert_allclose(modes.T @ modes, np.eye(9), atol=1e-10)


def test_h2_single_vibration():
    mol = build_molecule((MOLDIR / "h2.xyz").read_text(), "sto-3g")
    coords, _, _, converged = optimize_geometry(mol, gtol=1e-6)
    assert converged
    freqs, _, _ = harmonic_frequencies(mol, coords=coords)
    assert freqs.shape == (6,)
    # linear molecule: 5 TR zeros (projector drops the axial rotation)
    assert np.all(np.abs(freqs[:5]) < 20.0)
    assert 3500 < freqs[5] < 6500  # HF/STO-3G H2 stretch ~5000 cm^-1
