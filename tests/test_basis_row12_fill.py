"""He/Li/Be/B/Ne 6-31G coverage (round-5 fill: 6-31G is now complete H-Ar).

The new entries are audited variationally offline
(scripts/audit_row3_631g.py He Li Be B Ne: HF-limit window everywhere +
exponent stationarity where the published construction implies it —
Li/Be/B valence exponents carry Pople molecular scale factors and are
deliberately NOT atomic-stationary, see data_631g.py).  These tests pin
the in-repo invariants: element coverage/AO counts and atomic UHF
energies inside the split-valence window above the numerical HF limit.
UHF (not the audit's equivalence-restricted ROHF) lands AT or BELOW the
ROHF term energy, so the window check stays valid.
"""

import pytest

from nbed_tpu.chem import build_molecule

# numerical HF limits of the atomic ground terms (Koga/Clementi-Roetti)
HF_LIMIT = {
    "He": -2.861680, "Li": -7.432727, "Be": -14.573023,
    "B": -24.529061, "Ne": -128.547098,
}
SPIN = {"He": 0, "Li": 1, "Be": 0, "B": 1, "Ne": 0}
# [2s] = 2 AOs for He; [3s,2p] = 3+6 = 9 AOs for Li-Ne
NAO = {"He": 2, "Li": 9, "Be": 9, "B": 9, "Ne": 9}


@pytest.mark.parametrize("sym", sorted(HF_LIMIT))
def test_631g_row12_element_coverage(sym):
    mol = build_molecule(f"1\n\n{sym} 0.0 0.0 0.0", "6-31g")
    assert mol.nao == NAO[sym]


@pytest.mark.slow
@pytest.mark.parametrize("sym", sorted(HF_LIMIT))
def test_631g_row12_atomic_uhf_in_window(sym):
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule(f"1\n\n{sym} 0.0 0.0 0.0", "6-31g", spin=SPIN[sym])
    sol = SCFEngine(mol, conv_tol=1e-8, max_cycle=200,
                    init_guess="hcore").kernel()
    assert sol.converged, sym
    lim = HF_LIMIT[sym]
    assert lim - 1e-4 < sol.e_tot < lim + 0.090, (sym, sol.e_tot)


@pytest.mark.slow
def test_lih_631g_pipeline_partition_identity():
    """Li-containing end-to-end check needing no external oracle: the
    subsystem-DFT decomposition must rebuild the global KS total energy
    exactly (reference tests/test_driver.py:217-224 invariant)."""
    import numpy as np

    from nbed_tpu import nbed

    lih = "2\n\nLi  0.0  0.0  0.0\nH  0.0  0.0  1.5957\n"
    driver = nbed(geometry=lih, n_active_atoms=1, basis="6-31G",
                  xc_functional="b3lyp", projector="mu",
                  localization="spade", convergence=1e-8)
    total = (driver.e_act + driver.e_env + driver.two_e_cross
             + driver._global_ks.energy_nuc())
    assert np.isclose(total, driver._global_ks.e_tot, atol=1e-8)
