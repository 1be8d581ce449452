"""Quantum subspace expansion (QSE) excited states.

Exactness anchors (no external oracle needed):
- singles-QSE on the Hartree-Fock state spans exactly {HF} + singly
  excited determinants, so its excitation spectrum must equal CIS;
- a pool spanning the full particle-number sector (H2/STO-3G: singles +
  the one double) reproduces the sector FCI spectrum from *any* state;
- the spectrum is encoding-independent (JW == BK == parity).
"""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.scf.engine import SCFEngine
from nbed_tpu.solvers import run_cis, run_fci, run_qse, run_vqe

pytestmark = pytest.mark.slow  # compile-heavy; smoke tier = -m 'not slow'


@pytest.fixture(scope="module")
def h2_hamiltonian():
    xyz = "2\n\nH 0.0 0.0 0.0\nH 0.616 0.0 0.0"
    mol = build_molecule(xyz, "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10,
                    max_cycle=100).kernel()
    return HamiltonianBuilder(sol, 0).build()


def _interleaved_occ(sol):
    occ = np.asarray(sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])
    k = occ.shape[-1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[::2] = occ[0] > 0
    mask[1::2] = occ[1] > 0
    return mask


def test_qse_sd_pool_is_exact_for_h2(h2_hamiltonian):
    """singles+doubles span the whole (1,1) sector of H2 — QSE on the raw
    reference determinant must reproduce the full FCI sector spectrum."""
    const, h1, h2 = h2_hamiltonian
    exact, _ = run_fci(const, h1, h2, 4, (1, 1), k=4)
    res = run_qse(const, h1, h2, nelec=(1, 1), pool="sd")
    assert res.n_retained == 4
    assert np.allclose(res.energies[:4], exact[:4], atol=1e-9)


def test_qse_mapping_independent(h2_hamiltonian):
    const, h1, h2 = h2_hamiltonian
    spectra = [
        run_qse(const, h1, h2, nelec=(1, 1), pool="sd", mapping=m).energies
        for m in ("jw", "bk", "parity")
    ]
    assert np.allclose(spectra[0], spectra[1], atol=1e-10)
    assert np.allclose(spectra[0], spectra[2], atol=1e-10)


def test_qse_singles_on_hf_equals_cis(water_uhf):
    """On the HF state the singles-QSE subspace is {HF, singles}; by
    Brillouin the HF column decouples and the excited spectrum is CIS."""
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    qse = run_qse(0.0, h1, h2, nelec=(5, 5), pool="singles")
    cis = run_cis(h1, h2, _interleaved_occ(water_uhf))
    # root 0 is the HF state itself
    assert np.isclose(qse.energies[0] + water_uhf.energy_nuc(),
                      water_uhf.e_tot, atol=1e-7)
    assert len(qse.energies) == len(cis.excitations) + 1
    assert np.allclose(qse.excitations[1:], cis.excitations, atol=1e-7)


def test_qse_on_vqe_state_h2(h2_hamiltonian):
    """QSE on the converged VQE ground state: the identity column pins the
    ground energy at e_vqe (== FCI for H2) and the excited roots match the
    sector spectrum."""
    const, h1, h2 = h2_hamiltonian
    vqe = run_vqe(const, h1, h2, nelec=(1, 1))
    res = run_qse(const, h1, h2, nelec=(1, 1), pool="sd",
                  params=vqe.params)
    exact, _ = run_fci(const, h1, h2, 4, (1, 1), k=4)
    assert np.isclose(res.energies[0], vqe.e_vqe, atol=1e-8)
    assert np.allclose(res.energies[:4], exact[:4], atol=1e-8)
