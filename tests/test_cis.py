"""CIS/TDA excited states (beyond the reference).

The load-bearing check needs no external oracle: the spin-orbital CIS
matrix is, by construction, the Hamiltonian projected onto the
singly-excited determinant space shifted by the reference energy — so
its full spectrum must match an exact diagonalisation of that subspace
built independently from determinant bitstrings
(solvers/fci.sector_hamiltonian).
"""

import numpy as np
import pytest

from nbed_tpu.driver import run_emb_cis
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.solvers import run_cis, oscillator_strengths, spin_labels
from nbed_tpu.solvers.fci import sector_hamiltonian

pytestmark = pytest.mark.slow  # session SCF fixtures are compile-heavy


def _interleaved_occ(sol):
    occ = np.asarray(sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])
    k = occ.shape[-1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[::2] = occ[0] > 0
    mask[1::2] = occ[1] > 0
    return mask


def _singles_subspace_spectrum(h1, h2, occ_mask):
    """Exact eigenvalues of H restricted to span{singly excited dets}."""
    n = h1.shape[0]
    occ = np.where(occ_mask)[0]
    vir = np.where(~occ_mask)[0]
    hf = sum(1 << int(p) for p in occ)
    singles = sorted(
        (hf ^ (1 << int(i))) | (1 << int(a))
        for i in occ for a in vir if i % 2 == a % 2
    )
    nelec = (int(occ_mask[::2].sum()), int(occ_mask[1::2].sum()))
    ham, basis = sector_hamiltonian(0.0, h1, h2, n, nelec)
    idx = np.searchsorted(basis, np.asarray(singles, dtype=np.int64))
    assert np.array_equal(basis[idx], singles)
    sub = ham[np.ix_(idx, idx)].toarray()
    return np.linalg.eigvalsh(sub)


def test_cis_equals_singles_subspace(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ_mask = _interleaved_occ(water_uhf)
    res = run_cis(h1, h2, occ_mask)
    exact = _singles_subspace_spectrum(h1, h2, occ_mask)
    assert len(exact) == len(res.excitations)
    assert np.allclose(res.e_ref_elec + res.excitations, exact, atol=1e-9)
    # reference energy implied by the integrals == the SCF energy
    assert np.isclose(res.e_ref_elec + water_uhf.energy_nuc(),
                      water_uhf.e_tot, atol=1e-8)
    # all excitations above a bound ground state
    assert np.all(res.excitations > 0)


def test_cis_restricted_matches_unrestricted(water_rhf, water_uhf):
    spectra = []
    for sol in (water_rhf, water_uhf):
        _, h1, h2 = HamiltonianBuilder(sol, 0).build()
        spectra.append(run_cis(h1, h2, _interleaved_occ(sol)).excitations)
    assert np.allclose(spectra[0], spectra[1], atol=1e-6)


def test_cis_oscillator_strengths(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    res = run_cis(h1, h2, _interleaved_occ(water_uhf), nroots=8)
    f, mu = oscillator_strengths(water_uhf, res)
    assert f.shape == (8,) and mu.shape == (8, 3)
    assert np.all(f >= -1e-12)
    # closed-shell spectrum: every root is a clean singlet or triplet,
    # triplets are spin-forbidden (f == 0), and both kinds appear
    labels = spin_labels(water_uhf, res)
    assert all(abs(abs(s) - 1.0) < 1e-6 for _, s in labels)
    kinds = {lab for lab, _ in labels}
    assert kinds == {"singlet", "triplet"}
    for r, (lab, _) in enumerate(labels):
        if lab == "triplet":
            assert f[r] < 1e-10
    # water's lowest excitation is the 1b1 -> 4a1 triplet
    assert labels[0][0] == "triplet" and labels[1][0] == "singlet"


def test_embedded_cis(mu_driver):
    """Embedded CIS on the mu-embedded active region: spectrum matches the
    singles-subspace diagonalisation of the *embedded* Hamiltonian."""
    scf = mu_driver.mu["scf"]
    res = run_emb_cis(scf)
    _, h1, h2 = HamiltonianBuilder(scf, 0.0).build()
    occ_mask = _interleaved_occ(scf)
    exact = _singles_subspace_spectrum(h1, h2, occ_mask)
    assert np.allclose(res.e_ref_elec + res.excitations, exact, atol=1e-9)
    assert np.all(res.excitations > 0)
    # dominant() labels the HOMO->LUMO character of the lowest root
    i, a, amp = res.dominant(0, k=1)[0]
    assert occ_mask[i] and not occ_mask[a] and abs(amp) > 0.3


def test_driver_cis_flag(water_filepath):
    from nbed_tpu import nbed

    driver = nbed(
        geometry=str(water_filepath),
        n_active_atoms=1,
        basis="STO-3G",
        xc_functional="b3lyp",
        projector="mu",
        localization="spade",
        convergence=1e-6,
        run_cis_emb=4,
    )
    res = driver.mu
    assert len(res["cis"].excitations) == 4
    assert np.allclose(res["e_cis"], res["e_rhf"] + res["cis"].excitations)
    assert res["cis_oscillator_strengths"].shape == (4,)
