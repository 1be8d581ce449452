"""Restricted-open-shell SCF (ROHF / ROKS via Roothaan's effective Fock).

SURVEY §2.3 row "SCF drivers RHF/UHF/ROHF/RKS/UKS": the reference inherits
ROHF from PySCF but never exercises it (its driver is always unrestricted,
reference driver.py:69-78).  With no PySCF on the image the validation
oracles are exact internal identities:

- closed shell: the ROHF and UHF fixed points coincide;
- open shell: E_ROHF >= E_UHF (ROHF is UHF constrained to shared spatial
  orbitals) and <S^2> = s(s+1) exactly (the beta space is a subspace of
  the alpha space, so the determinant is spin-pure);
- stationarity: every coupling block of the converged Fock vanishes in MO
  basis (closed-open via F_beta, open-virtual via F_alpha, closed-virtual
  via the closed Fock) — the defining ROHF equations.
"""

from pathlib import Path

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.scf.engine import SCFEngine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def methyl_molecule():
    xyz = (Path(__file__).parent / "molecules" / "methyl_radical.xyz").read_text()
    return build_molecule(xyz, "sto-3g", spin=1)


def test_rohf_closed_shell_equals_uhf(water_molecule):
    uhf = SCFEngine(water_molecule, conv_tol=1e-10, dm_conv_tol=1e-8,
                    max_cycle=100).kernel()
    rohf = SCFEngine(water_molecule, rohf=True, conv_tol=1e-10,
                     dm_conv_tol=1e-8, max_cycle=100).kernel()
    assert rohf.converged
    assert np.isclose(rohf.e_tot, uhf.e_tot, atol=1e-9)


def test_rohf_doublet(methyl_molecule):
    uhf = SCFEngine(methyl_molecule, conv_tol=1e-10, dm_conv_tol=1e-8,
                    max_cycle=100).kernel()
    rohf = SCFEngine(methyl_molecule, rohf=True, conv_tol=1e-10,
                     dm_conv_tol=1e-8, max_cycle=100).kernel()
    assert rohf.converged
    # shared spatial orbitals
    assert np.allclose(rohf.mo_coeff[0], rohf.mo_coeff[1], atol=1e-12)
    # variational: UHF relaxes the shared-orbital constraint
    assert rohf.e_tot >= uhf.e_tot - 1e-10
    assert rohf.e_tot - uhf.e_tot < 5e-3  # same state, small relaxation
    # spin-pure determinant: <S^2> = 0.75 exactly (UHF's is contaminated)
    s2_ro, mult_ro = rohf.spin_square()
    s2_u, _ = uhf.spin_square()
    assert abs(s2_ro - 0.75) < 1e-10
    assert s2_u > 0.75 + 1e-6


def test_rohf_stationarity_blocks(methyl_molecule):
    """The converged shared-orbital Fock blocks satisfy the ROHF equations:
    F_beta(closed,open) = F_alpha(open,virtual) = F_c(closed,virtual) = 0."""
    eng = SCFEngine(methyl_molecule, rohf=True, conv_tol=1e-12,
                    dm_conv_tol=1e-10, max_cycle=200)
    sol = eng.kernel()
    assert sol.converged
    na, nb = sol.nelec
    c = np.asarray(sol.mo_coeff[0])
    dm = sol.make_rdm1()
    j, k = eng.get_jk(dm)
    f = np.asarray(eng.hcore)[None] + np.asarray(j)[None] - np.asarray(k)
    fa = c.T @ f[0] @ c
    fb = c.T @ f[1] @ c
    fc = 0.5 * (fa + fb)
    assert np.max(np.abs(fb[:nb, nb:na])) < 1e-6   # closed-open
    assert np.max(np.abs(fa[nb:na, na:])) < 1e-6   # open-virtual
    assert np.max(np.abs(fc[:nb, na:])) < 1e-6     # closed-virtual


def test_roks_doublet_spin_pure(methyl_molecule):
    """ROKS (restricted-open-shell Kohn-Sham): same constraint machinery
    under a hybrid functional; the determinant stays spin-pure."""
    roks = SCFEngine(methyl_molecule, xc="b3lyp", rohf=True, conv_tol=1e-9,
                     dm_conv_tol=1e-7, max_cycle=100).kernel()
    assert roks.converged
    assert np.allclose(roks.mo_coeff[0], roks.mo_coeff[1], atol=1e-12)
    s2, _ = roks.spin_square()
    assert abs(s2 - 0.75) < 1e-10
    uks = SCFEngine(methyl_molecule, xc="b3lyp", conv_tol=1e-9,
                    dm_conv_tol=1e-7, max_cycle=100).kernel()
    assert roks.e_tot >= uks.e_tot - 1e-8
