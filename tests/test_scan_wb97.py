"""SCAN and wB97/wB97X tests: exact-constraint oracles + SCF sanity.

Same validation stance as test_metagga.py (no libxc in the image): these
functionals were *constructed* from exact constraints, so the constraints
discriminate the implementation — SCAN's appropriate norms and UEG limits
(PRL 115, 036402 (2015)), the B97 family's UEG sum rules (Chai &
Head-Gordon, JCP 128, 084106 (2008): c_x0 + c_x,HF-SR = 1, ICF(0) = 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nbed_tpu.chem import build_molecule
from nbed_tpu.dft.functionals import (
    _WB97X_CX,
    b97_c,
    b97_sr_x,
    pw92_c,
    resolve_functional,
    scan_c,
    scan_x,
    slater_x,
)
from nbed_tpu.scf.engine import SCFEngine

H2 = "2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.74\n"


def _h1s_radial(n=400, rmax=15.0):
    x, w = np.polynomial.legendre.leggauss(n)
    r = rmax * (x + 1.0) / 2.0
    wr = (rmax / 2.0) * w * 4.0 * np.pi * r**2
    rho = np.exp(-2.0 * r) / np.pi
    return r, wr, rho


def test_scan_uniform_gas_limits():
    """sigma = 0, tau = tau_unif (alpha = 1): exchange -> Slater LDA,
    correlation -> PW92 exactly."""
    rho = jnp.array([4.0, 1.0, 0.05, 1e-6])
    ra = rb = rho / 2.0
    z = jnp.zeros_like(rho)
    ts = 0.5 * 0.3 * (3 * np.pi**2) ** (2 / 3) * rho ** (5 / 3)
    assert np.allclose(np.asarray(scan_x(ra, rb, z, z, z, ts, ts)),
                       np.asarray(slater_x(ra, rb, z, z, z)), rtol=1e-10)
    assert np.allclose(np.asarray(scan_c(ra, rb, z, z, z, ts, ts)),
                       np.asarray(pw92_c(ra, rb, z, z, z)), rtol=1e-10)


def test_scan_one_electron_correlation_vanishes():
    """alpha = 0, zeta = 1: Gc(1) = 0 and f_c(0) = 1 make eps_c exactly 0
    for any one-electron density (SCAN's self-interaction-free design)."""
    _, wr, rho = _h1s_radial()
    zero = np.zeros_like(rho)
    ec = scan_c(jnp.array(rho), jnp.array(zero), jnp.array(4.0 * rho**2),
                jnp.array(zero), jnp.array(zero), jnp.array(rho / 2.0),
                jnp.array(zero))
    assert abs(float(np.sum(wr * np.asarray(ec)))) < 1e-10


def test_scan_h1s_exchange_near_exact():
    """h0x = 1.174 was tuned on appropriate single-orbital norms; the
    hydrogen-1s exchange must land near the exact -5/16 Ha (loose bound:
    SCAN is accurate, not exact, on this norm)."""
    _, wr, rho = _h1s_radial()
    zero = np.zeros_like(rho)
    ex = scan_x(jnp.array(rho), jnp.array(zero), jnp.array(4.0 * rho**2),
                jnp.array(zero), jnp.array(zero), jnp.array(rho / 2.0),
                jnp.array(zero))
    e_x = float(np.sum(wr * np.asarray(ex)))
    assert abs(e_x - (-5.0 / 16.0)) < 5e-3


def test_b97_ueg_sum_rules():
    """ICF(0) = 1: B97 correlation == PW92 at the UEG; wB97X exchange in
    the omega->0 limit == c_x0 * LDA with c_x0 + c_HF-SR = 1 exactly."""
    rho = jnp.array([4.0, 1.0, 0.05])
    ra, rb = rho / 2.0, rho / 2.0
    z = jnp.zeros_like(rho)
    bc = b97_c((1.0,), (1.0,))
    assert np.allclose(np.asarray(bc(ra, rb, z, z, z)),
                       np.asarray(pw92_c(ra, rb, z, z, z)), rtol=1e-12)
    bx = b97_sr_x(_WB97X_CX, 1e-9)
    ratio = np.asarray(bx(ra, rb, z, z, z)) / np.asarray(
        slater_x(ra, rb, z, z, z))
    assert np.allclose(ratio, _WB97X_CX[0], rtol=1e-6)
    terms, hyb, rsh = resolve_functional("wb97x")
    assert np.isclose(hyb + rsh[0], 1.0)  # 100% exact exchange at r->inf


@pytest.mark.parametrize("xc", ["scan", "wb97x"])
def test_scf_converges(xc):
    mol = build_molecule(H2, "sto-3g")
    sol = SCFEngine(mol, xc=xc, conv_tol=1e-8, max_cycle=100).kernel()
    assert sol.converged
    # H2/STO-3G total energy: every sane functional lands in this window
    # (HF -1.117, B3LYP -1.165, LDA -1.14)
    assert -1.25 < sol.e_tot < -1.05


@pytest.mark.slow
def test_scf_water_scan_wb97x():
    water = ("3\n\nO 0.0 0.0 0.115\nH 0.0 0.754 -0.459\n"
             "H 0.0 -0.754 -0.459\n")
    mol = build_molecule(water, "sto-3g")
    for xc, lo, hi in (("scan", -75.8, -74.9), ("wb97x", -75.8, -74.9)):
        sol = SCFEngine(mol, xc=xc, conv_tol=1e-7, max_cycle=120).kernel()
        assert sol.converged, xc
        assert lo < sol.e_tot < hi, (xc, sol.e_tot)


@pytest.mark.slow
def test_scan_hydrogen_atom_scf_exact():
    """End-to-end external oracle: SCAN is EXACT for the hydrogen atom
    (Sun, Ruzsinszky & Perdew, PRL 115, 036402 (2015) — single-orbital
    densities have alpha=0, where SCAN exchange cancels the Hartree energy
    and SCAN correlation vanishes).  In a finite basis this means the
    converged SCAN total energy must coincide with UHF in the SAME basis
    (for one electron, exact exchange == HF exchange), up to grid
    quadrature error.  A functional-form error in h1x/gx/correlation
    breaks this at the mHa scale; grid error is ~1e-5 Ha at level 3."""
    mol = build_molecule("1\n\nH 0.0 0.0 0.0", "6-31g", spin=1)
    hf = SCFEngine(mol, conv_tol=1e-10, max_cycle=100).kernel()
    scan = SCFEngine(mol, xc="scan", conv_tol=1e-10, max_cycle=100).kernel()
    assert hf.converged and scan.converged
    # 6-31G UHF hydrogen: -0.498233 Ha (basis-limited; exact -0.5)
    assert abs(hf.e_tot - (-0.498233)) < 5e-5
    assert abs(scan.e_tot - hf.e_tot) < 5e-5, (scan.e_tot, hf.e_tot)
