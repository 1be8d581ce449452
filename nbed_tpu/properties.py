"""Molecular properties from SCF solutions: dipoles and population analysis.

Diagnostics layer beyond the reference (which delegates everything to
PySCF and exposes no property API of its own): dipole moments from the
device-evaluated position-operator integrals (integrals/core.py
``dipole_integrals``) and Mulliken/Löwdin population analysis — the
standard sanity checks when choosing an active region for embedding.

All functions accept an :class:`~nbed_tpu.scf.engine.SCFSolution` (global
or embedded — for an embedded solution the density is the active-subsystem
density, so populations report where the *embedded* electrons sit).
"""

from __future__ import annotations

import numpy as np

from .integrals import dipole_integrals

__all__ = [
    "dipole_moment",
    "mulliken_populations",
    "lowdin_populations",
    "mulliken_charges",
    "lowdin_charges",
    "atomic_spin_densities",
]

DEBYE_PER_AU = 2.541746473


def _total_dm(scf_sol):
    dm = np.asarray(scf_sol.make_rdm1())
    return dm.sum(axis=0) if dm.ndim == 3 else dm


def _spin_dm(scf_sol):
    dm = np.asarray(scf_sol.make_rdm1())
    if dm.ndim == 2:
        return np.zeros_like(dm)
    return dm[0] - dm[1]


def dipole_moment(scf_sol, origin=(0.0, 0.0, 0.0), unit: str = "debye"):
    """Total (nuclear + electronic) dipole moment, shape (3,).

    ``origin`` is in Bohr.  For a neutral system the result is
    origin-independent (tested as an exact identity); for ions it shifts by
    ``q * origin``.  ``unit`` is ``"debye"`` or ``"au"``.
    """
    mol = scf_sol.mol
    origin = np.asarray(origin, dtype=float)
    dm = _total_dm(scf_sol)
    r_ints = np.asarray(dipole_integrals(mol))  # <mu| r |nu> about 0
    d_el = -np.einsum("xij,ij->x", r_ints, dm)
    z = np.asarray(mol.atom_charges, dtype=float)
    coords = np.asarray(mol.coords)
    d_nuc = z @ coords
    # electron count from tr(D S); total charge fixes the origin shift
    n_el = float(np.einsum("ij,ji->", dm, np.asarray(scf_sol.engine.s)))
    q = z.sum() - n_el
    d = d_nuc + d_el - q * origin
    if unit.lower() == "debye":
        return d * DEBYE_PER_AU
    return d


def _per_atom(mol, ao_values):
    """Sum an (nao,) vector into per-atom buckets via aoslice_by_atom."""
    slices = mol.aoslice_by_atom()
    return np.array([
        ao_values[slices[ia, 2]: slices[ia, 3]].sum() for ia in range(mol.natm)
    ])


def mulliken_populations(scf_sol):
    """Mulliken gross populations per atom: diag blocks of D S."""
    mol = scf_sol.mol
    s = np.asarray(scf_sol.engine.s)
    ds = np.einsum("ij,ji->i", _total_dm(scf_sol), s)
    return _per_atom(mol, ds)


def lowdin_populations(scf_sol):
    """Löwdin populations per atom: diag of S^1/2 D S^1/2."""
    mol = scf_sol.mol
    s = np.asarray(scf_sol.engine.s)
    w, v = np.linalg.eigh(s)
    s_half = (v * np.sqrt(np.clip(w, 0, None))) @ v.T
    p = np.einsum("ij,jk,ki->i", s_half, _total_dm(scf_sol), s_half)
    return _per_atom(mol, p)


def mulliken_charges(scf_sol):
    """Mulliken atomic charges Z_A - pop_A."""
    return np.asarray(scf_sol.mol.atom_charges, float) - mulliken_populations(scf_sol)


def lowdin_charges(scf_sol):
    """Löwdin atomic charges Z_A - pop_A."""
    return np.asarray(scf_sol.mol.atom_charges, float) - lowdin_populations(scf_sol)


def atomic_spin_densities(scf_sol, scheme: str = "mulliken"):
    """Per-atom spin density <n_alpha - n_beta> (Mulliken or Löwdin)."""
    mol = scf_sol.mol
    s = np.asarray(scf_sol.engine.s)
    dm_spin = _spin_dm(scf_sol)
    if scheme == "mulliken":
        vals = np.einsum("ij,ji->i", dm_spin, s)
    elif scheme == "lowdin":
        w, v = np.linalg.eigh(s)
        s_half = (v * np.sqrt(np.clip(w, 0, None))) @ v.T
        vals = np.einsum("ij,jk,ki->i", s_half, dm_spin, s_half)
    else:
        raise ValueError(f"Unknown scheme '{scheme}' (mulliken|lowdin).")
    return _per_atom(mol, vals)
