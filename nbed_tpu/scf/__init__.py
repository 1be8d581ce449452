"""Functional SCF engine (RHF/UHF/RKS/UKS) with embedding hooks.

One spin-generic jit-compiled engine subsumes the reference's four delegated
PySCF drivers *and* its hand-written Huzinaga loop (reference
scf/huzinaga_scf.py:93-206): the embedding potential ``v_emb`` and the
Huzinaga projector are explicit optional terms of the Fock build, not
monkey-patches of ``get_hcore`` (cf. reference driver.py:527-529).
"""

from .engine import SCFEngine, SCFSolution
from .hf import SCFResult, make_rdm1, run_scf
from .huzinaga import huzinaga_scf

__all__ = [
    "run_scf", "SCFResult", "make_rdm1",
    "SCFEngine", "SCFSolution", "huzinaga_scf",
]
