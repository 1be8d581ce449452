"""Analytic nuclear gradients of the HF energy via autodiff (beyond the
reference).

The reference (UCL-CCS/Nbed) has no nuclear gradients anywhere — it never
needs them because PySCF supplies geometries. Here they come almost for
free: every integral in :mod:`nbed_tpu.integrals` is a pure, differentiable
function of the atomic coordinates, so the analytic gradient is one
``jax.grad`` over the standard stationary-point energy functional

    E(x) = Tr[D h(x)] + E_J[D; g(x)] - hyb * E_K[D_s; g(x)]
           - Tr[W S(x)] + E_nuc(x)

with the converged density ``D`` and energy-weighted density ``W`` held
fixed. Because the SCF energy is stationary in the MO coefficients subject
to C^T S C = 1, differentiating this functional at fixed (D, W) yields the
exact analytic gradient including the Pulay (basis-set derivative) terms —
the -Tr[W dS/dx] term is exactly the orbital-connection contribution that a
naive Hellmann-Feynman treatment misses. This is the classic analytic HF
gradient (Pulay 1969) expressed as reverse-mode AD over the integral
kernels instead of hand-derived derivative integrals: the vjp of the
McMurchie-Davidson E/R tables *is* the derivative-integral recursion.

Scope: HF only (``hyb=1``, no XC). KS gradients additionally need the
quadrature-grid response (Becke weights move with the atoms); the grid
builder is host-side numpy, so that path raises for now.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.molecule import Molecule
from ..integrals import (
    eri_tensor,
    kinetic,
    nuclear_attraction,
    overlap,
    point_charge_attraction,
)
from ..scf import run_scf

__all__ = ["hf_gradient", "optimize_geometry"]


def _energy_functional(mol: Molecule, dm, w_tot, hyb: float):
    """Return E(x) with density/energy-weighted-density held fixed.

    ``dm``: (2, n, n) converged spin densities. ``w_tot``: (n, n) spin-summed
    energy-weighted density sum_s C_s diag(occ_s * eps_s) C_s^T.
    """
    dm = jax.lax.stop_gradient(jnp.asarray(dm))
    w_tot = jax.lax.stop_gradient(jnp.asarray(w_tot))
    d_tot = dm[0] + dm[1]

    def energy(x):
        h = kinetic(mol, x) + nuclear_attraction(mol, x)
        if mol.mm_coords is not None:
            h = h + point_charge_attraction(
                mol, mol.mm_coords, mol.mm_charges, mol.mm_radii, coords=x
            )
        s = overlap(mol, x)
        g = eri_tensor(mol, x)
        e1 = jnp.sum(d_tot * h)
        ej = 0.5 * jnp.einsum("ij,ijkl,kl", d_tot, g, d_tot)
        ek = 0.5 * sum(
            jnp.einsum("ij,ikjl,kl", dm[s_], g, dm[s_]) for s_ in (0, 1)
        )
        pulay = -jnp.sum(w_tot * s)
        return e1 + ej - hyb * ek + pulay + mol.energy_nuc(x)

    return energy


def hf_gradient(
    mol: Molecule,
    coords=None,
    scf_result=None,
    dm0=None,
    conv_tol: float = 1e-10,
    dm_conv_tol: float = 1e-8,
    max_cycle: int = 100,
):
    """Analytic nuclear gradient of the (U)HF total energy.

    Returns ``(e_tot, grad, scf_result)`` with ``grad`` of shape (natm, 3)
    in Ha/bohr. ``scf_result`` (an :class:`~nbed_tpu.scf.SCFResult`) may be
    passed in to skip the SCF; ``dm0`` warm-starts it (used heavily by
    :func:`optimize_geometry`).
    """
    x = jnp.asarray(mol.coords if coords is None else coords)
    n = mol.nao
    if scf_result is None:
        h = kinetic(mol, x) + nuclear_attraction(mol, x)
        if mol.mm_coords is not None:
            h = h + point_charge_attraction(
                mol, mol.mm_coords, mol.mm_charges, mol.mm_radii, coords=x
            )
        g = eri_tensor(mol, x)
        scf_result = run_scf(
            hcore=h,
            s=overlap(mol, x),
            eri_j=g.reshape(n * n, n * n),
            eri_k=jnp.transpose(g, (0, 2, 1, 3)).reshape(n * n, n * n),
            nelec=mol.nelec,
            dm0=dm0,
            conv_tol=conv_tol,
            dm_conv_tol=dm_conv_tol,
            max_cycle=max_cycle,
        )
    res = scf_result
    # W_s = C_s diag(occ_s * eps_s) C_s^T, spin-summed.
    w_tot = jnp.einsum(
        "spi,si,si,sqi->pq", res.mo_coeff, res.mo_occ, res.mo_energy, res.mo_coeff
    )
    energy = _energy_functional(mol, res.dm, w_tot, hyb=1.0)
    grad = jax.grad(energy)(x)
    e_tot = res.e_elec + mol.energy_nuc(x)
    return e_tot, grad, res


def optimize_geometry(
    mol: Molecule,
    coords0=None,
    gtol: float = 3e-5,
    max_steps: int = 50,
    verbose: bool = False,
):
    """Geometry optimization on the analytic HF gradient (host-side BFGS).

    Each energy/gradient evaluation re-runs the SCF warm-started from the
    previous step's density. Returns ``(coords, e_tot, n_steps, converged)``
    with coords in bohr.
    """
    from scipy.optimize import minimize

    x0 = np.asarray(mol.coords if coords0 is None else coords0, dtype=np.float64)
    state = {"dm0": None, "steps": 0, "gmax": np.inf}

    def fun(flat):
        x = jnp.asarray(flat.reshape(-1, 3))
        e, g, res = hf_gradient(mol, coords=x, dm0=state["dm0"])
        state["dm0"] = res.dm
        state["steps"] += 1
        state["gmax"] = float(jnp.max(jnp.abs(g)))
        if verbose:
            print(f"  step {state['steps']}: e={float(e):.10f}  |g|max={state['gmax']:.2e}")
        return float(e), np.asarray(g, dtype=np.float64).ravel()

    out = minimize(
        fun,
        x0.ravel(),
        jac=True,
        method="BFGS",
        options={"gtol": gtol, "maxiter": max_steps},
    )
    # scipy's success flag trips on "precision loss" when line-search energy
    # differences near the minimum fall under the SCF noise floor; what
    # matters chemically is the residual gradient.
    coords = out.x.reshape(-1, 3)
    _, g_final, _ = hf_gradient(mol, coords=jnp.asarray(coords), dm0=state["dm0"])
    gmax = float(jnp.max(jnp.abs(g_final)))
    converged = bool(out.success) or gmax <= gtol
    return coords, float(out.fun), state["steps"], converged
