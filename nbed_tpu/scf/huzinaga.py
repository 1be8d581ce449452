"""Standalone Huzinaga SCF (API parity with reference scf/huzinaga_scf.py).

The reference implements its only hand-written SCF loop here
(huzinaga_scf.py:93-206); in this framework the Huzinaga projector is a
first-class term of the jitted engine, so this wrapper simply routes
through :func:`nbed_tpu.scf.hf.run_scf` and reshapes restricted inputs
(total densities / single-spin potentials) to the spin-resolved internal
convention and back.
"""

from typing import Optional

import numpy as np

from .hf import run_scf

__all__ = ["huzinaga_scf"]


def huzinaga_scf(
    scf_engine,
    embedding_potential,
    dm_environment_occupied,
    dm_environment_virtual=None,
    dm_conv_tol: float = 1e-6,
    dm_initial_guess: Optional[np.ndarray] = None,
    use_diis: bool = True,
    nelec=None,
):
    """Run SCF with the Huzinaga projector -(FDS + SDF).

    Args:
        scf_engine: an :class:`nbed_tpu.scf.engine.SCFEngine` (HF or KS; its
            ``restricted`` flag selects the reporting convention).
        embedding_potential: (n, n) for restricted or (2, n, n).
        dm_environment_occupied: environment density — *total* (n, n) for
            restricted (the reference's -0.5 factor, huzinaga_scf.py:82) or
            per-spin (2, n, n).
        dm_environment_virtual: optional virtual-space projector density.
        dm_initial_guess: optional density initial guess (same convention).
        nelec: optional electron-count override.

    Returns:
        (mo_coeff, mo_energy, density_matrix, huzinaga_op, converged) with
        restricted outputs spin-collapsed and densities spin-summed, exactly
        as the reference returns them (huzinaga_scf.py:206).
    """
    restricted = np.asarray(embedding_potential).ndim == 2

    def expand(x):
        if x is None:
            return None
        x = np.asarray(x)
        return np.stack([x, x]) * 0.5 if x.ndim == 2 else x

    v_emb = np.asarray(embedding_potential)
    if v_emb.ndim == 2:
        v_emb = np.stack([v_emb, v_emb])  # same potential, both spins

    res = run_scf(
        hcore=scf_engine.hcore,
        s=scf_engine.s,
        eri_j=scf_engine.eri_j,
        eri_k=scf_engine.eri_k,
        nelec=scf_engine.mol.nelec if nelec is None else nelec,
        v_emb=v_emb,
        xc_fn=scf_engine.xc_fn,
        hyb=scf_engine.hyb,
        dm_env_occ=expand(dm_environment_occupied),
        dm_env_virt=expand(dm_environment_virtual),
        dm0=expand(dm_initial_guess),
        conv_tol=scf_engine.conv_tol,
        dm_conv_tol=dm_conv_tol,
        max_cycle=scf_engine.max_cycle,
        use_diis=use_diis,
    )
    mo_coeff = np.asarray(res.mo_coeff)
    mo_energy = np.asarray(res.mo_energy)
    dm = np.asarray(res.dm)
    huz = np.asarray(res.huzinaga_op)
    conv = bool(res.converged)
    if restricted:
        return mo_coeff[0], mo_energy[0], dm[0] + dm[1], huz[0], conv
    return mo_coeff, mo_energy, dm, huz, conv
