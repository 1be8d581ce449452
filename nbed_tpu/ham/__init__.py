"""Second-quantised Hamiltonians and qubit mappings.

Replaces the reference's PySCF ``ao2mo`` + OpenFermion delegation
(reference ham_builder.py, SURVEY.md §2.3 rows 7, 13): AO->MO transforms are
jit einsum chains, the spatial->spin-orbital interleave is vectorised strided
assignment (the reference's quadruple Python loop, ham_builder.py:180-210),
and Jordan-Wigner / Bravyi-Kitaev term generation uses a bitmask Pauli
algebra.
"""

from .builder import EQ_TOLERANCE, HamiltonianBuilder, reduce_virtuals
from .qubit import (
    PauliSum,
    bravyi_kitaev,
    jordan_wigner,
    measurement_groups,
    parity_transform,
    pauli_ground_state,
    pauli_sum_to_sparse,
)
from .taper import Z2Symmetry, find_z2_symmetries, taper, taper_auto

__all__ = [
    "HamiltonianBuilder",
    "reduce_virtuals",
    "EQ_TOLERANCE",
    "jordan_wigner",
    "bravyi_kitaev",
    "parity_transform",
    "PauliSum",
    "pauli_sum_to_sparse",
    "pauli_ground_state",
    "measurement_groups",
    "Z2Symmetry",
    "find_z2_symmetries",
    "taper",
    "taper_auto",
]
