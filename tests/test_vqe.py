"""VQE solver tests.

Oracle strategy mirrors the builder tests (diagonalise-and-compare,
reference tests/test_builder.py:55-68): the disentangled-UCCSD VQE is
variational and particle-conserving, so its energy must (a) upper-bound
the FCI sector energy, (b) reach it exactly for 2-electron systems
(one double amplitude spans the full singlet space), and (c) land within
UCCSD truncation error for many-electron systems.
"""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.ham import HamiltonianBuilder, reduce_virtuals
from nbed_tpu.scf.engine import SCFEngine
from nbed_tpu.solvers import run_fci, run_vqe

pytestmark = pytest.mark.slow  # compile-heavy; smoke tier = -m 'not slow'


@pytest.fixture(scope="module")
def h2_hamiltonian():
    xyz = "2\n\nH 0.0 0.0 0.0\nH 0.616 0.0 0.0"
    mol = build_molecule(xyz, "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10,
                    max_cycle=100).kernel()
    const, h1, h2 = HamiltonianBuilder(sol, 0).build()
    return const, h1, h2


def test_h2_vqe_exact(h2_hamiltonian):
    """2 electrons: the single double amplitude rotates exactly onto FCI."""
    const, h1, h2 = h2_hamiltonian
    e_fci, _ = run_fci(const, h1, h2, 4, (1, 1))
    res = run_vqe(const, h1, h2, nelec=(1, 1))
    assert res.converged
    assert res.e_vqe > e_fci[0] - 1e-9  # variational bound
    assert np.isclose(res.e_vqe, e_fci[0], atol=1e-7)
    assert res.e_reference > res.e_vqe  # HF above the correlated energy


def test_h2_bk_matches_jw(h2_hamiltonian):
    const, h1, h2 = h2_hamiltonian
    jw = run_vqe(const, h1, h2, nelec=(1, 1), mapping="jw")
    bk = run_vqe(const, h1, h2, nelec=(1, 1), mapping="bk")
    assert np.isclose(jw.e_vqe, bk.e_vqe, atol=1e-7)
    assert np.isclose(jw.e_reference, bk.e_reference, atol=1e-9)


def test_h2_parity_matches_jw(h2_hamiltonian):
    """Parity encoding: reference-determinant encoding (prefix parities)
    and the full ansatz both reproduce the JW result."""
    const, h1, h2 = h2_hamiltonian
    jw = run_vqe(const, h1, h2, nelec=(1, 1), mapping="jw")
    pa = run_vqe(const, h1, h2, nelec=(1, 1), mapping="parity")
    assert pa.converged
    assert np.isclose(jw.e_vqe, pa.e_vqe, atol=1e-7)
    assert np.isclose(jw.e_reference, pa.e_reference, atol=1e-9)


def test_reduced_water_vqe(water_rhf):
    """10 electrons / 12 spin-orbitals: UCCSD within truncation error of
    the sector FCI, never below it."""
    reduced = reduce_virtuals(water_rhf, 1)
    const, h1, h2 = HamiltonianBuilder(reduced, 0).build()
    n_so = h1.shape[0]
    assert n_so == 12
    e_fci, _ = run_fci(const, h1, h2, n_so, (5, 5))
    res = run_vqe(const, h1, h2, nelec=(5, 5))
    assert res.converged
    assert res.e_vqe > e_fci[0] - 1e-9
    assert res.e_vqe - e_fci[0] < 1e-4
    assert res.e_reference - res.e_vqe > 1e-4  # real correlation recovered


def test_embedded_vqe_in_dft(mu_driver):
    """The package's end purpose (reference docs/notebooks/7.
    vqe-in-dft.ipynb): VQE on the embedded second-quantised Hamiltonian
    reproduces the embedded-FCI energy."""
    const, h1, h2 = mu_driver.mu["second_quantised"]
    occ = np.asarray(mu_driver.mu["scf"].mo_occ)
    nelec = (int(occ[0].sum()), int(occ[1].sum()))
    res = run_vqe(const, h1, h2, nelec=nelec)
    assert res.converged
    e_fci = mu_driver.mu["e_fci"]
    assert res.e_vqe > e_fci - 1e-9
    assert res.e_vqe - e_fci < 2e-4


def test_driver_run_vqe_emb(nbed_args):
    """Config-level integration: run_vqe_emb records e_vqe beside e_fci."""
    from nbed_tpu import nbed

    args = dict(nbed_args)
    args.update(projector="mu", run_ccsd_emb=False, run_fci_emb=True,
                run_vqe_emb=True)
    driver = nbed(**args)
    assert "e_vqe" in driver.mu and driver.mu["vqe"].converged
    assert driver.mu["e_vqe"] > driver.mu["e_fci"] - 1e-9
    assert driver.mu["e_vqe"] - driver.mu["e_fci"] < 2e-4


def test_adapt_vqe_reduced_water(water_rhf):
    """ADAPT-VQE reaches UCCSD-grade accuracy with a compact ansatz and a
    monotone energy trajectory."""
    from nbed_tpu.solvers import run_adapt_vqe

    reduced = reduce_virtuals(water_rhf, 1)
    const, h1, h2 = HamiltonianBuilder(reduced, 0).build()
    e_fci, _ = run_fci(const, h1, h2, 12, (5, 5))
    res = run_adapt_vqe(const, h1, h2, nelec=(5, 5), grad_tol=1e-4)
    assert res.converged
    assert res.e_vqe > e_fci[0] - 1e-9
    assert res.e_vqe - e_fci[0] < 1e-4
    # compact: far fewer operators than the full pool would give
    full = run_vqe(const, h1, h2, nelec=(5, 5))
    assert len(res.op_indices) < full.n_params
    # monotone descent over adapt iterations
    energies = [e for (_, _, e) in res.history]
    assert all(b <= a + 1e-10 for a, b in zip(energies, energies[1:]))
