"""Quantum subspace expansion (QSE) excited states on a VQE state.

Beyond the reference (which exports the embedded Hamiltonian to an
external SDK and stops): given any prepared state |psi> — the built-in
VQE's converged ansatz, or the raw reference determinant — diagonalise
the mapped Hamiltonian in the subspace

    span{ O_I |psi> },   O_I in {identity} + fermionic singles (+doubles)

by solving the generalised eigenproblem  M w = E S w  with
M_IJ = <psi|O_I^dag H O_J|psi>, S_IJ = <psi|O_I^dag O_J|psi>
(McClean et al., PRA 95, 042308 (2017)).  On hardware these matrix
elements are Pauli expectation values of O_I^dag H O_J; in this
statevector simulation they are assembled exactly from the same bitmask
Pauli algebra as the VQE (ham/qubit.py).

Exactness anchors used by the tests (no external oracle):
- on the Hartree-Fock state with the singles pool, QSE == CIS (the
  subspace is exactly {HF, singly-excited determinants});
- with a pool whose span covers the full particle-number sector, QSE
  reproduces the sector FCI spectrum regardless of |psi>.

Subspace sizes are tiny (tens of operators), so the dense linear algebra
runs on the host in complex128; the only device-scale object is the
statevector itself (reconstructed by :func:`vqe_statevector`).
"""

from dataclasses import dataclass

import numpy as np

from ..ham.qubit import (MAPPINGS as _MAPPERS, _grouped_weights,
                         _ladder_factory)
from .vqe import (_operator_terms, uccsd_excitations, vqe_statevector)

__all__ = ["run_qse", "QSEResult"]


@dataclass
class QSEResult:
    """QSE spectrum. ``energies`` are absolute (Ha, ascending) eigenvalues
    of the subspace problem; ``excitations = energies - energies[0]``.
    ``weights[r]`` expands root r over the operator pool (column 0 is the
    identity; then the pool order)."""

    energies: np.ndarray
    excitations: np.ndarray
    weights: np.ndarray
    n_operators: int
    n_retained: int  # after S-canonical orthogonalisation
    s_min_eig: float


def _apply_pauli_terms(terms, psi):
    """Apply ``sum_t c_t X^x Z^z`` to a statevector.

    Convention (ham/qubit.py): out[col ^ x] += c * (-1)^parity(col & z)
    * v[col].
    """
    dim = psi.shape[0]
    cols = np.arange(dim, dtype=np.int64)
    out = np.zeros(dim, dtype=np.complex128)
    for (x, z), c in terms.items():
        signed = c * (1.0 - 2.0 * (_parity(cols & z))) * psi
        out[cols ^ x] += signed
    return out


def _parity(arr):
    arr = np.asarray(arr, dtype=np.int64).copy()
    for shift in (32, 16, 8, 4, 2, 1):
        arr ^= arr >> shift
    return (arr & 1).astype(np.float64)


def _apply_hamiltonian(ux, weights, psi):
    """H |psi> from the grouped-X-mask weights (same convention)."""
    dim = psi.shape[0]
    cols = np.arange(dim, dtype=np.int64)
    out = np.zeros(dim, dtype=np.complex128)
    for g in range(len(ux)):
        out[cols ^ ux[g]] += weights[g] * psi
    return out


def run_qse(constant, h1, h2, nelec, mapping: str = "jw", params=None,
            ansatz_excitations=None, pool: str = "singles",
            nroots: int | None = None, s_tol: float = 1e-8) -> QSEResult:
    """Quantum subspace expansion on (a VQE state over) the Hamiltonian.

    Args:
        constant, h1, h2: the driver's ``second_quantised`` output.
        nelec: ``(n_alpha, n_beta)`` active electrons.
        mapping: fermion-to-qubit encoding ("jw" | "bk" | "parity").
        params: VQE amplitudes to prepare |psi> (None = the reference
            determinant, in which case singles-QSE == CIS).
        ansatz_excitations: the excitation list the amplitudes refer to
            (as passed to / defaulted by :func:`run_vqe`).
        pool: "singles" or "sd" — the expansion operator set (the
            identity is always included).
        nroots: truncate the returned spectrum.
        s_tol: relative overlap-eigenvalue cutoff for the canonical
            orthogonalisation of the (generally singular) subspace.
    """
    h1 = np.asarray(h1)
    n_so = h1.shape[0]
    psum = _MAPPERS[mapping](constant, h1, h2)
    ux, weights, dim = _grouped_weights(psum)

    psi = vqe_statevector(constant, h1, h2, nelec, mapping=mapping,
                          params=params, excitations=ansatz_excitations)
    psi = psi.astype(np.complex128)

    ladder = _ladder_factory(mapping, n_so)
    _, excs = uccsd_excitations(n_so, nelec)
    if pool == "singles":
        excs = [e for e in excs if len(e[0]) == 1]
    elif pool != "sd":
        raise ValueError(f"unknown pool '{pool}'")

    # |phi_I> = O_I |psi>; column 0 is the identity
    phis = [psi]
    for cre, ann in excs:
        terms = _operator_terms(cre, ann, ladder)
        phis.append(_apply_pauli_terms(terms, psi))
    phi = np.stack(phis, axis=1)  # (dim, P)

    h_phi = np.stack(
        [_apply_hamiltonian(ux, weights, phi[:, j])
         for j in range(phi.shape[1])], axis=1)
    s_mat = phi.conj().T @ phi
    m_mat = phi.conj().T @ h_phi
    m_mat = 0.5 * (m_mat + m_mat.conj().T)  # Hermitise roundoff

    # canonical orthogonalisation: project out the null space of S
    s_eig, s_vec = np.linalg.eigh(s_mat)
    keep = s_eig > s_tol * s_eig.max()
    xmat = s_vec[:, keep] / np.sqrt(s_eig[keep])
    h_red = xmat.conj().T @ m_mat @ xmat
    vals, vecs = np.linalg.eigh(h_red)
    w = (xmat @ vecs).T  # rows = roots, in operator-pool coordinates

    if nroots is not None:
        vals, w = vals[:nroots], w[:nroots]
    return QSEResult(
        energies=vals,
        excitations=vals - vals[0],
        weights=w,
        n_operators=phi.shape[1],
        n_retained=int(keep.sum()),
        s_min_eig=float(s_eig.min().real),
    )
