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


def test_water_ir_and_thermo(water_min):
    from nbed_tpu.solvers import ir_intensities, thermochemistry
    from nbed_tpu.solvers.thermo import HA_PER_K_TO_CAL_MOL_K

    from nbed_tpu.solvers import dipole_derivative_fd

    mol, coords = water_min
    freqs, modes, _ = harmonic_frequencies(mol, coords=coords)
    mu_x = dipole_derivative_fd(mol, coords=coords)
    # translational sum rule: moving a neutral molecule rigidly leaves the
    # dipole unchanged, so atom blocks of dmu/dx sum to ~0
    np.testing.assert_allclose(
        mu_x.reshape(mol.natm, 3, 3).sum(axis=0), 0.0, atol=5e-5
    )
    intens = ir_intensities(mol, modes, coords=coords, mu_x=mu_x)
    assert intens.shape == (9,)
    assert np.all(intens >= -1e-10)
    # all three vibrations of water are IR active (C2v: a1 bend, a1 sym
    # stretch, b2 asym stretch); rotations of a polar molecule carry
    # formal intensity so only the vibrational entries are asserted
    assert np.all(intens[6:] > 1.0)
    assert np.all(intens[6:] < 1e4)

    th = thermochemistry(mol, freqs, coords=coords)
    # ZPE identity vs the frequencies themselves
    vib = freqs[np.abs(freqs) >= 30.0]
    np.testing.assert_allclose(th["zpe"], 0.5 * vib.sum() / 219474.6313705,
                               rtol=1e-12)
    # water gas-phase S(298) ~ 45 cal/(mol K); generous RRHO window
    s_cal = th["s_tot"] * HA_PER_K_TO_CAL_MOL_K
    assert 38.0 < s_cal < 52.0
    # G = H - T S identity
    np.testing.assert_allclose(
        th["g_therm"], th["h_therm"] - th["temperature"] * th["s_tot"],
        rtol=1e-12,
    )
    assert th["n_imaginary"] == 0
    # entropy increases with temperature
    th2 = thermochemistry(mol, freqs, coords=coords, temperature=500.0)
    assert th2["s_tot"] > th["s_tot"]


def test_h2_thermo_linear_rotor():
    from nbed_tpu.solvers import thermochemistry

    mol = build_molecule((MOLDIR / "h2.xyz").read_text(), "sto-3g")
    # fake spectrum: 5 TR zeros + one stretch
    freqs = np.array([0.0] * 5 + [5000.0])
    th = thermochemistry(mol, freqs, symmetry_number=2)
    # H2(g) S(298) ~ 31 cal/(mol K)
    from nbed_tpu.solvers.thermo import HA_PER_K_TO_CAL_MOL_K

    s_cal = th["s_tot"] * HA_PER_K_TO_CAL_MOL_K
    assert 27.0 < s_cal < 35.0
    # one vibration: ZPE = 2500 cm^-1
    np.testing.assert_allclose(th["zpe"], 2500.0 / 219474.6313705, rtol=1e-12)
