"""Double-hybrid functionals (B2PLYP family): hybrid-GGA SCF + c_PT2*E(2)
on the KS orbitals (beyond the reference, which stops at global hybrids).

No external oracle is available offline; the validation anchors are
(a) the exact identity run_pt2(KS->HF limit) == run_mp2 — for canonical
HF orbitals the rebuilt Fock diagonal equals the eigenvalues, so both
E(2) paths must agree to solver precision — and (b) structural checks
on the B2PLYP result (negative correlation, correct assembly)."""

import numpy as np
import pytest

from nbed_tpu.dft.functionals import pt2_coefficient
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.scf.engine import SCFEngine
from nbed_tpu.solvers import run_double_hybrid, run_mp2, run_pt2

pytestmark = pytest.mark.slow


def _interleaved(sol):
    eps = np.asarray(sol.mo_energy)
    occ = np.asarray(sol.mo_occ)
    k = eps.shape[-1]
    eps_so = np.empty(2 * k)
    eps_so[0::2], eps_so[1::2] = eps[0], eps[1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[0::2], mask[1::2] = occ[0] > 0, occ[1] > 0
    return eps_so, mask


def test_pt2_equals_mp2_on_hf_orbitals(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    eps_so, mask = _interleaved(water_uhf)
    e2_mp2, _ = run_mp2(h1, h2, mask)
    e2_pt2 = run_pt2(h2, eps_so, mask)
    assert np.isclose(e2_pt2, e2_mp2, atol=1e-9)


def test_pt2_coefficients():
    assert pt2_coefficient("b2plyp") == 0.27
    assert pt2_coefficient("B2-PLYP") == 0.27
    assert pt2_coefficient("b2gpplyp") == 0.36
    assert pt2_coefficient("b3lyp") == 0.0
    assert pt2_coefficient(None) == 0.0


def test_b2plyp_water(water_molecule):
    sol = SCFEngine(water_molecule, xc="b2plyp", conv_tol=1e-9,
                    dm_conv_tol=1e-7, max_cycle=100).kernel()
    assert sol.converged
    e_tot, e_pt2 = run_double_hybrid(sol)
    assert -0.2 < e_pt2 < -0.005  # attractive correlation, sane magnitude
    assert np.isclose(e_tot, sol.e_tot + 0.27 * e_pt2, atol=1e-12)
    # the SCF part alone sits between pure-GGA BLYP and pure HF energies
    assert e_tot < sol.e_tot


def test_run_double_hybrid_rejects_non_dh(water_uhf):
    with pytest.raises(ValueError, match="double-hybrid"):
        run_double_hybrid(water_uhf)
