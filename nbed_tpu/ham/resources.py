"""Qubit-resource accounting: qubit and Pauli-term counts.

The reference's headline results are problem-size reductions (qubits and
JW Pauli-term counts, full system vs embedded — BASELINE.md table from the
PRA 109, 022418 replication notebook). This module computes those numbers
from builder output.
"""

from .builder import HamiltonianBuilder
from .qubit import bravyi_kitaev, jordan_wigner

__all__ = ["hamiltonian_resources", "embedding_reduction"]


def hamiltonian_resources(constant, h1, h2, mapping: str = "jw",
                          tol: float = 1e-12) -> dict:
    """{'n_qubits', 'n_terms'} for a second-quantised Hamiltonian."""
    mapper = jordan_wigner if mapping == "jw" else bravyi_kitaev
    psum = mapper(constant, h1, h2, tol=tol)
    return {"n_qubits": psum.n_qubits, "n_terms": len(psum)}


def embedding_reduction(driver, mapping: str = "jw") -> dict:
    """Full-system vs embedded qubit/term counts for a completed driver.

    Reproduces the reference's qubit-reduction table rows
    (e.g. BASELINE.md: ethanamine 44 -> 28 qubits, 329,299 -> 49,707 terms).
    """
    full = HamiltonianBuilder(driver._global_hf, 0.0).build()
    out = {"full": hamiltonian_resources(*full, mapping=mapping)}
    for name in ("mu", "huzinaga"):
        result = getattr(driver, name)
        if result is not None:
            out[name] = hamiltonian_resources(
                *result["second_quantised"], mapping=mapping
            )
    return out
