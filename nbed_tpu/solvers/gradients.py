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

KS gradients additionally need the quadrature-grid response — the Becke
partition weights and grid points move with the atoms. Because
:func:`nbed_tpu.grids.build_grid` and :func:`~nbed_tpu.grids.eval_aos` are
themselves pure functions of the coordinates, that response comes from the
same ``jax.grad``: the gradient is exactly consistent with the *discretized*
energy surface (the thing a geometry optimizer actually descends), grid
response included — no frozen-grid approximation.
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

__all__ = ["hf_gradient", "ks_gradient", "optimize_geometry"]


def _energy_functional(mol: Molecule, dm, w_tot, hyb: float, xc_name=None,
                       grid_scheme: str = "reference", grid_level: int = 3,
                       rsh=None):
    """Return E(x) with density/energy-weighted-density held fixed.

    ``dm``: (2, n, n) converged spin densities. ``w_tot``: (n, n) spin-summed
    energy-weighted density sum_s C_s diag(occ_s * eps_s) C_s^T.
    """
    dm = jax.lax.stop_gradient(jnp.asarray(dm))
    w_tot = jax.lax.stop_gradient(jnp.asarray(w_tot))
    d_tot = dm[0] + dm[1]

    # NOTE on w_tot: it must be built as W = sum_s D_s F(D)_s D_s from the
    # Fock at the *converged density* (see _w_from_dm), NOT from the
    # returned mo_energy: the SCF loop's final eigenpairs diagonalize the
    # DIIS-extrapolated Fock, whose eigenvalues can sit ~1e-3 off the true
    # KS/HF eigenvalues even when the density is converged to 1e-10 (the
    # density can be symmetry-exact after one cycle while DIIS still mixes
    # guess-era Focks). D F D is the occupied-block Lagrange-multiplier
    # matrix exactly, with no eigendecomposition to go stale.

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
        e = e1 + ej - hyb * ek - jnp.sum(w_tot * s) + mol.energy_nuc(x)
        if rsh is not None:
            # range-separated hybrid: - beta * E_K over the long-range
            # erf(omega*r12)/r12 ERIs (differentiable like the full kernel)
            beta, omega = rsh
            g_lr = eri_tensor(mol, x, omega=omega)
            ek_lr = 0.5 * sum(
                jnp.einsum("ij,ikjl,kl", dm[s_], g_lr, dm[s_]) for s_ in (0, 1)
            )
            e = e - beta * ek_lr
        if xc_name is not None:
            from ..dft.xc import make_xc_fn
            from ..grids import build_grid, eval_aos

            points, weights = build_grid(
                mol, coords=x, scheme=grid_scheme, level=grid_level
            )
            ao, ao_grad = eval_aos(mol, points, coords=x)
            exc, _ = make_xc_fn(ao, ao_grad, weights, xc_name)(dm)
            e = e + exc
        return e

    return energy


def _w_from_dm(mol, x, dm, hyb: float, xc_name=None,
               grid_scheme: str = "reference", grid_level: int = 3,
               rsh=None):
    """Energy-weighted density W = sum_s D_s F(D)_s D_s at coords ``x``."""
    dm = jnp.asarray(dm)
    h = kinetic(mol, x) + nuclear_attraction(mol, x)
    if mol.mm_coords is not None:
        h = h + point_charge_attraction(
            mol, mol.mm_coords, mol.mm_charges, mol.mm_radii, coords=x
        )
    g = eri_tensor(mol, x)
    j = jnp.einsum("ijkl,kl->ij", g, dm[0] + dm[1])
    k = jnp.stack(
        [jnp.einsum("ikjl,kl->ij", g, dm[s_]) for s_ in (0, 1)]
    )
    f = h[None] + j[None] - hyb * k
    if rsh is not None:
        beta, omega = rsh
        g_lr = eri_tensor(mol, x, omega=omega)
        k_lr = jnp.stack(
            [jnp.einsum("ikjl,kl->ij", g_lr, dm[s_]) for s_ in (0, 1)]
        )
        f = f - beta * k_lr
    if xc_name is not None:
        from ..dft.xc import make_xc_fn
        from ..grids import build_grid, eval_aos

        points, weights = build_grid(
            mol, coords=x, scheme=grid_scheme, level=grid_level
        )
        ao, ao_grad = eval_aos(mol, points, coords=x)
        _, vxc = make_xc_fn(ao, ao_grad, weights, xc_name)(dm)
        f = f + vxc
    return sum(dm[s_] @ f[s_] @ dm[s_] for s_ in (0, 1))


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
    w_tot = _w_from_dm(mol, x, res.dm, hyb=1.0)
    energy = _energy_functional(mol, res.dm, w_tot, hyb=1.0)
    grad = jax.grad(energy)(x)
    e_tot = res.e_elec + mol.energy_nuc(x)
    return e_tot, grad, res


def ks_gradient(
    mol: Molecule,
    xc: str,
    coords=None,
    solution=None,
    grid_scheme: str = "reference",
    grid_level: int = 3,
    conv_tol: float = 1e-10,
    dm_conv_tol: float = 1e-8,
    max_cycle: int = 100,
):
    """Analytic nuclear gradient of the (U)KS total energy, grid response
    included.

    Returns ``(e_tot, grad, solution)``; ``solution`` may be a pre-converged
    :class:`~nbed_tpu.scf.SCFSolution` (from ``SCFEngine(...).kernel()``) to
    skip the SCF.
    """
    from ..dft.functionals import resolve_functional
    from ..scf.engine import SCFEngine

    x = jnp.asarray(mol.coords if coords is None else coords)
    if solution is None:
        solution = SCFEngine(
            mol, xc=xc, coords=np.asarray(x),
            grid_scheme=grid_scheme, grid_level=grid_level,
            conv_tol=conv_tol, dm_conv_tol=dm_conv_tol, max_cycle=max_cycle,
        ).kernel()
    c = jnp.asarray(solution.mo_coeff)
    occ = jnp.asarray(solution.mo_occ)
    if c.ndim == 2:  # restricted-collapsed solution: occ counts electrons
        dm = 0.5 * jnp.einsum("pi,i,qi->pq", c, occ, c)[None].repeat(2, 0)
    else:
        dm = jnp.einsum("spi,si,sqi->spq", c, occ, c)
    _, hyb, rsh = resolve_functional(xc)
    w_tot = _w_from_dm(mol, x, dm, hyb=hyb, xc_name=xc,
                       grid_scheme=grid_scheme, grid_level=grid_level, rsh=rsh)
    energy = _energy_functional(
        mol, dm, w_tot, hyb=hyb, xc_name=xc,
        grid_scheme=grid_scheme, grid_level=grid_level, rsh=rsh,
    )
    grad = jax.grad(energy)(x)
    return solution.e_tot, grad, solution


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
