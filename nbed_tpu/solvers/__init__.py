"""Reference correlated solvers: exact diagonalisation (FCI) and CCSD.

Replaces the reference's PySCF ``fci.FCI`` / ``cc.CCSD`` delegation
(reference driver.py:1044-1135): FCI is a number-sector exact
diagonalisation over determinant bitstrings (supports spin-resolved
embedded one-body integrals, cf. driver.py:1091-1097); CCSD is a
spin-orbital einsum implementation jitted end-to-end.
"""

from .ccsd import run_ccsd
from .cis import (run_cis, run_rpa, oscillator_strengths, polarizability,
                  spin_labels, CISResult, RPAResult)
from .mp2 import run_double_hybrid, run_mp2, run_pt2
from .fci import run_fci, sector_hamiltonian
from .hessian import (dipole_derivative_fd, harmonic_frequencies,
                      hessian_fd, ir_intensities)
from .thermo import thermochemistry
from .qse import run_qse, QSEResult
from .tddft import run_tddft_rpa, run_tddft_tda
from .stability import run_stability, rotate_towards, stable_scf, StabilityResult
from .vqe import run_adapt_vqe, run_vqe, uccsd_excitations, vqe_statevector

__all__ = ["run_fci", "run_ccsd", "run_cis", "run_rpa",
           "oscillator_strengths", "RPAResult", "run_tddft_tda", "run_tddft_rpa", "polarizability",
           "spin_labels",
           "CISResult", "run_mp2", "run_pt2",
           "run_double_hybrid", "sector_hamiltonian",
           "harmonic_frequencies", "hessian_fd", "ir_intensities",
           "dipole_derivative_fd", "thermochemistry", "run_vqe",
           "run_adapt_vqe", "uccsd_excitations", "vqe_statevector",
           "run_qse", "QSEResult", "run_stability", "rotate_towards",
           "stable_scf", "StabilityResult"]
