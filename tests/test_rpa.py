"""Full RPA / TDHF excited states (beyond the reference).

Anchors, none needing an external oracle:

1. the Hermitian reduction must reproduce the positive eigenvalues of
   the full non-Hermitian response matrix [[A, B], [-B, -A]] built
   directly from the same integrals;
2. the de-excitation coupling lowers (never raises) the lowest
   excitation relative to CIS/TDA;
3. RPA imaginary modes appear exactly when the stability analysis finds
   the underlying determinant unstable (omega^2 is congruent to A+B).
"""

import numpy as np
import pytest

from nbed_tpu.driver import run_emb_rpa
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.solvers import run_cis, run_rpa, oscillator_strengths
from nbed_tpu.solvers.cis import _a_matrix, _singles_frame

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


def test_rpa_matches_full_nonhermitian_problem(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ_mask = _interleaved_occ(water_uhf)
    res = run_rpa(h1, h2, occ_mask)
    assert res.n_imaginary == 0

    w, fock, _, i_idx, a_idx = _singles_frame(h1, h2, occ_mask)
    a_mat = _a_matrix(w, fock, i_idx, a_idx)
    b_mat = w[a_idx[:, None], a_idx[None, :], i_idx[:, None], i_idx[None, :]]
    full = np.block([[a_mat, b_mat], [-b_mat, -a_mat]])
    ev = np.linalg.eigvals(full)
    assert np.max(np.abs(ev.imag)) < 1e-10
    pos = np.sort(ev.real[ev.real > 0.0])
    assert len(pos) == len(res.excitations)
    assert np.allclose(res.excitations, pos, atol=1e-9)

    # normalisation (X+Y)·(X−Y) = 1 root by root
    overlap = np.einsum("rp,rp->r", res.amplitudes, res.xmy)
    assert np.allclose(overlap, 1.0, atol=1e-9)


def test_rpa_lowers_cis(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ_mask = _interleaved_occ(water_uhf)
    cis = run_cis(h1, h2, occ_mask, nroots=3)
    rpa = run_rpa(h1, h2, occ_mask, nroots=3)
    assert rpa.excitations[0] <= cis.excitations[0] + 1e-12
    # but the coupling is a correction, not a rearrangement, at equilibrium
    assert abs(rpa.excitations[0] - cis.excitations[0]) < 0.05

    # oscillator strengths work on the RPA result unchanged (X+Y gauge)
    f_rpa, mu = oscillator_strengths(water_uhf, rpa)
    assert np.all(f_rpa >= -1e-12)
    assert np.any(f_rpa > 1e-3)


def test_rpa_imaginary_iff_unstable():
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine
    from nbed_tpu.solvers import run_stability

    xyz = "2\n\nH 0.0 0.0 0.0\nH 2.5 0.0 0.0"
    mol = build_molecule(xyz, "sto-3g")
    sym = SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10,
                    max_cycle=200).kernel()  # spin-symmetric saddle
    _, h1, h2 = HamiltonianBuilder(sym, 0.0).build()
    occ_mask = _interleaved_occ(sym)
    stab = run_stability(h1, h2, occ_mask)
    rpa = run_rpa(h1, h2, occ_mask)
    assert not stab.stable
    assert rpa.n_imaginary > 0


def test_polarizability_identity_and_physics(water_uhf):
    """SOS polarizability == the closed-form (A+B)^{-1} contraction
    (exact with the full spectrum), and the tensor is symmetric PSD with
    a sensible water-scale isotropic value."""
    from nbed_tpu.solvers import polarizability
    from nbed_tpu.solvers.cis import _pair_dipoles

    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    occ_mask = _interleaved_occ(water_uhf)
    rpa = run_rpa(h1, h2, occ_mask)
    alpha = polarizability(water_uhf, rpa)

    w, fock, _, i_idx, a_idx = _singles_frame(h1, h2, occ_mask)
    a_mat = _a_matrix(w, fock, i_idx, a_idx)
    b_mat = w[a_idx[:, None], a_idx[None, :], i_idx[:, None], i_idx[None, :]]
    d = _pair_dipoles(water_uhf, rpa.pairs)  # (npairs, 3)
    alpha_direct = 2.0 * d.T @ np.linalg.solve(a_mat + b_mat, d)
    assert np.allclose(alpha, alpha_direct, atol=1e-9)

    assert np.allclose(alpha, alpha.T, atol=1e-10)
    evs = np.linalg.eigvalsh(alpha)
    assert np.all(evs > 0)
    # water STO-3G TDHF isotropic polarizability is O(1-10) a.u.
    iso = np.trace(alpha) / 3.0
    assert 0.5 < iso < 20.0
    # dynamic alpha grows towards the first pole
    alpha_dyn = polarizability(water_uhf, rpa, omega=0.2)
    assert np.trace(alpha_dyn) / 3.0 > iso


def test_driver_rpa_flag(water_filepath):
    from nbed_tpu import nbed

    driver = nbed(
        geometry=str(water_filepath), n_active_atoms=1, basis="STO-3G",
        xc_functional="b3lyp", projector="mu", localization="spade",
        convergence=1e-8, run_rpa_emb=3,
    )
    res = driver.mu
    assert len(res["e_rpa"]) == 3
    assert np.all(np.asarray(res["rpa_oscillator_strengths"]) >= -1e-12)
    assert np.all(np.asarray(res["e_rpa"]) > res["e_rhf"])
    # full spectrum retained on the result for polarizability use
    assert res["rpa"].amplitudes.shape[0] == res["rpa"].pairs.shape[0]


def test_embedded_rpa(mu_driver):
    cis = run_emb_rpa(mu_driver.mu["scf"], nroots=4)
    assert cis.n_imaginary == 0
    assert np.all(np.diff(cis.excitations) >= -1e-12)
    assert cis.excitations[0] > 0.1  # water-like first excitation
