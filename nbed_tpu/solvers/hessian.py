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

__all__ = ["hessian_fd", "harmonic_frequencies", "dipole_derivative_fd",
           "ir_intensities"]

FREQ_AU_TO_CM = 219474.6313705
# 1 (e/sqrt(amu))^2 of |dmu/dQ|^2 = 974.88 km/mol of integrated intensity:
# 42.2561 km/mol per (D/(Angstrom sqrt(amu)))^2 times (4.80320 D/A per e)^2
IR_AU_TO_KM_MOL = 974.8801


def _displacements(x0: np.ndarray, step: float) -> np.ndarray:
    """(2*3N, natm, 3) centrally displaced geometries, +/- interleaved."""
    natm = x0.shape[0]
    n3 = 3 * natm
    disp = []
    for i in range(n3):
        for sgn in (+1.0, -1.0):
            d = x0.copy().ravel()
            d[i] += sgn * step
            disp.append(d.reshape(natm, 3))
    return np.stack(disp)


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
    disp = _displacements(x0, step)  # (2*n3, natm, 3)

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


def dipole_derivative_fd(
    mol: Molecule,
    coords=None,
    step: float = 5e-3,
    mesh=None,
    conv_tol: float = 1e-10,
    dm_conv_tol: float = 1e-8,
    max_cycle: int = 100,
):
    """Dipole derivatives dmu/dx, shape (3N, 3), in a.u. (e), by central
    differences of the analytic HF dipole — all 6N displaced SCF + dipole
    evaluations in one vmapped compiled program (mesh batch-shardable)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..integrals import (
        dipole_integrals,
        eri_tensor,
        kinetic,
        nuclear_attraction,
        overlap,
        point_charge_attraction,
    )
    from ..scf import run_scf

    x0 = np.asarray(mol.coords if coords is None else coords, dtype=np.float64)
    n3 = 3 * x0.shape[0]
    disp = jnp.asarray(_displacements(x0, step))
    z = jnp.asarray(mol.atom_charges, dtype=jnp.float64)
    n = mol.nao

    def one(x):
        h = kinetic(mol, x) + nuclear_attraction(mol, x)
        if mol.mm_coords is not None:
            h = h + point_charge_attraction(
                mol, mol.mm_coords, mol.mm_charges, mol.mm_radii, coords=x
            )
        g = eri_tensor(mol, x)
        res = run_scf(
            hcore=h,
            s=overlap(mol, x),
            eri_j=g.reshape(n * n, n * n),
            eri_k=jnp.transpose(g, (0, 2, 1, 3)).reshape(n * n, n * n),
            nelec=mol.nelec,
            conv_tol=conv_tol,
            dm_conv_tol=dm_conv_tol,
            max_cycle=max_cycle,
        )
        d_tot = res.dm[0] + res.dm[1]
        d = z @ x - jnp.einsum("xij,ij->x", dipole_integrals(mol, x), d_tot)
        return d, res.converged

    fn = jax.vmap(one)
    if mesh is not None:
        s1 = NamedSharding(mesh, P("batch"))
        s3 = NamedSharding(mesh, P("batch", None, None))
        disp = jax.device_put(disp, s3)
        fn = jax.jit(fn, out_shardings=(NamedSharding(mesh, P("batch", None)), s1))
    else:
        fn = jax.jit(fn)
    dips, conv = fn(disp)
    if not bool(np.all(np.asarray(conv))):
        raise RuntimeError("Displaced SCF did not converge; dipole derivative invalid.")
    dips = np.asarray(dips)
    return (dips[0::2] - dips[1::2]) / (2.0 * step)  # (3N, 3)


def ir_intensities(
    mol: Molecule,
    modes: np.ndarray,
    coords=None,
    step: float = 5e-3,
    mesh=None,
    mu_x=None,
    **scf_kw,
):
    """Harmonic IR intensities (km/mol) per normal mode, shape (3N,).

    ``modes`` are the mass-weighted normal modes from
    :func:`harmonic_frequencies` (columns). Intensity_i = 974.88 *
    |sum_j (dmu/dx_j) L_ji / sqrt(m_j[amu])|^2 — the squared dipole
    derivative along each normal coordinate. Translational modes come out
    ~0 (neutral molecules); note the projected *rotational* modes of a
    polar molecule legitimately carry intensity (rotating the frame
    rotates the dipole) — only the vibrational entries are physical IR
    intensities. Pass a precomputed ``mu_x`` from
    :func:`dipole_derivative_fd` to skip the displaced-SCF batch.
    """
    from ..chem.masses import AMU_TO_ME

    if mu_x is None:
        mu_x = dipole_derivative_fd(mol, coords=coords, step=step, mesh=mesh,
                                    **scf_kw)  # (3N, 3)
    m_amu = np.repeat(atom_masses_me(mol) / AMU_TO_ME, 3)
    dmudq = (modes / np.sqrt(m_amu)[:, None]).T @ mu_x  # (3N, 3) e/sqrt(amu)
    return IR_AU_TO_KM_MOL * np.sum(dmudq**2, axis=1)
