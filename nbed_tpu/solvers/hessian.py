"""Harmonic vibrational analysis: semi-numerical Hessians from batched
analytic gradients (beyond the reference — UCL-CCS/Nbed has no nuclear
derivatives anywhere).

The Hessian is the central finite difference of the *analytic* nuclear
gradient (solvers/gradients.py) over 6N displaced geometries. All 6N
displaced SCF-plus-gradient evaluations run as ONE compiled, vmapped
program (`parallel.batched_hf_gradients`) — data-parallel over a device
mesh batch axis when one is provided. This is the standard semi-numerical
scheme (exact first derivatives, differenced once), accurate to O(step²)
with none of the CPHF response machinery an all-analytic Hessian needs.

Frequencies follow from the mass-weighted Hessian: eigenvalues λ in
Eh/(mₑ·a₀²) give angular frequencies ω = √λ in units of 1/t₀, i.e.
ν̃ = √λ · 219474.63 cm⁻¹ (numerically the same factor as Eh→cm⁻¹ because
ħω in a.u. equals ω). Translations and rotations are projected out of the
mass-weighted Hessian (Eckart frame) before diagonalisation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..chem.masses import atom_masses_me
from ..chem.molecule import Molecule

__all__ = ["hessian_fd", "harmonic_frequencies"]

FREQ_AU_TO_CM = 219474.6313705


def hessian_fd(
    mol: Molecule,
    coords=None,
    step: float = 5e-3,
    mesh=None,
    xc: str | None = None,
    conv_tol: float = 1e-10,
    dm_conv_tol: float = 1e-8,
    max_cycle: int = 100,
):
    """Nuclear Hessian (3N, 3N) in Ha/bohr² by central differences of the
    analytic gradient.

    HF (``xc=None``) batches all 6N displaced evaluations into one vmapped
    program; KS loops the (grid-response-exact) ``ks_gradient`` serially.
    Returns the symmetrised Hessian as a numpy array.
    """
    x0 = np.asarray(mol.coords if coords is None else coords, dtype=np.float64)
    natm = x0.shape[0]
    n3 = 3 * natm

    disp = []
    for i in range(n3):
        for sgn in (+1.0, -1.0):
            d = x0.copy().ravel()
            d[i] += sgn * step
            disp.append(d.reshape(natm, 3))
    disp = np.stack(disp)  # (2*n3, natm, 3)

    if xc is None:
        from ..parallel import batched_hf_gradients

        _, grads, conv = batched_hf_gradients(
            mol, jnp.asarray(disp), mesh=mesh,
            conv_tol=conv_tol, dm_conv_tol=dm_conv_tol, max_cycle=max_cycle,
        )
        grads = np.asarray(grads).reshape(2 * n3, n3)
        if not bool(np.all(np.asarray(conv))):
            raise RuntimeError("Displaced SCF did not converge; Hessian invalid.")
    else:
        from .gradients import ks_gradient

        grads = np.empty((2 * n3, n3))
        for k in range(2 * n3):
            _, g, sol = ks_gradient(
                mol, xc, coords=jnp.asarray(disp[k]),
                conv_tol=conv_tol, dm_conv_tol=dm_conv_tol, max_cycle=max_cycle,
            )
            if not sol.converged:
                raise RuntimeError("Displaced SCF did not converge; Hessian invalid.")
            grads[k] = np.asarray(g).ravel()

    hess = (grads[0::2] - grads[1::2]) / (2.0 * step)  # row i = dg/dx_i
    return 0.5 * (hess + hess.T)


def _tr_projector(x0: np.ndarray, sqrt_m: np.ndarray) -> np.ndarray:
    """Orthonormal basis of mass-weighted translations + rotations (3N, k)."""
    natm = x0.shape[0]
    com = (sqrt_m**2 @ x0) / np.sum(sqrt_m**2)
    r = x0 - com
    vecs = []
    for k in range(3):  # translations
        t = np.zeros((natm, 3))
        t[:, k] = 1.0
        vecs.append((t * sqrt_m[:, None]).ravel())
    for k in range(3):  # rotations about axis k
        e = np.zeros(3)
        e[k] = 1.0
        rot = np.cross(np.broadcast_to(e, r.shape), r)
        vecs.append((rot * sqrt_m[:, None]).ravel())
    basis = np.stack(vecs, axis=1)
    q, rdiag = np.linalg.qr(basis)
    keep = np.abs(np.diag(rdiag)) > 1e-8  # linear molecules: 5, not 6
    return q[:, keep]


def harmonic_frequencies(
    mol: Molecule,
    coords=None,
    step: float = 5e-3,
    mesh=None,
    xc: str | None = None,
    project: bool = True,
    **scf_kw,
):
    """Harmonic frequencies (cm⁻¹) and normal modes at ``coords``.

    Returns ``(freqs, modes, hessian)``: ``freqs`` (3N,) sorted ascending,
    with imaginary frequencies reported as negative numbers; ``modes``
    (3N, 3N) columns are mass-weighted normal modes; ``hessian`` (3N, 3N)
    the Cartesian Hessian in Ha/bohr². With ``project=True`` (default) the
    translational/rotational subspace is projected out of the mass-weighted
    Hessian, so the 6 (5 for linear) TR eigenvalues come out exactly zero.
    """
    x0 = np.asarray(mol.coords if coords is None else coords, dtype=np.float64)
    hess = hessian_fd(mol, coords=x0, step=step, mesh=mesh, xc=xc, **scf_kw)

    sqrt_m = np.sqrt(atom_masses_me(mol))
    w = np.repeat(sqrt_m, 3)
    h_mw = hess / np.outer(w, w)
    if project:
        q = _tr_projector(x0, sqrt_m)
        p = np.eye(h_mw.shape[0]) - q @ q.T
        h_mw = p @ h_mw @ p
    lam, modes = np.linalg.eigh(h_mw)
    freqs = np.sign(lam) * np.sqrt(np.abs(lam)) * FREQ_AU_TO_CM
    return freqs, modes, hess
