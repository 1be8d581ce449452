"""SCF stability analysis and instability following.

Beyond the reference (which inherits whatever stationary point PySCF's
SCF lands on): the real/internal orbital-rotation Hessian of a converged
(possibly embedded) SCF solution is ``A + B`` over the M_s-conserving
single-excitation space,

    (A+B)[(ia),(jb)] = f_ab d_ij - f_ij d_ab + <aj||ib> + <ab||ij>,

assembled from the same MO spin-orbital integrals as CIS (Seeger &
Pople, JCP 66, 3045 (1977)).  A negative eigenvalue means the "solution"
is a saddle point; :func:`rotate_towards` steps the orbitals along the
unstable mode so the SCF can be re-converged downhill — this catches the
classic restricted -> broken-symmetry (Coulson-Fischer) instability and
embedded-SCF saddle points alike.

The Hessian is tiny (n_occ x n_virt rows), so it runs on the host; the
expensive inputs come from the device-side builder pipeline.
"""

from dataclasses import dataclass

import numpy as np

from .cis import _a_matrix, _singles_frame

__all__ = ["run_stability", "rotate_towards", "StabilityResult"]


@dataclass
class StabilityResult:
    """Orbital-rotation Hessian spectrum (ascending eigenvalues of A+B)."""

    eigenvalues: np.ndarray
    modes: np.ndarray  # (nroots, npairs) rotation directions
    pairs: np.ndarray  # (npairs, 2) (i, a) spin-orbital indices
    stable: bool

    @property
    def lowest(self) -> float:
        return float(self.eigenvalues[0])


def run_stability(so_h1, so_h2, occ_mask, nroots: int = 4,
                  tol: float = -1e-6) -> StabilityResult:
    """Internal (real) stability of the determinant behind the integrals.

    Args:
        so_h1, so_h2, occ_mask: as for :func:`nbed_tpu.solvers.run_cis`
            (the HamiltonianBuilder output and interleaved occupation).
        nroots: how many lowest Hessian modes to return.
        tol: the solution counts as stable iff the lowest eigenvalue
            exceeds ``tol`` (slightly negative values are roundoff).
    """
    w, fock, _, i_idx, a_idx = _singles_frame(so_h1, so_h2, occ_mask)
    ab = _a_matrix(w, fock, i_idx, a_idx)
    # B[(ia),(jb)] = <ab||ij>
    ab = ab + w[a_idx[:, None], a_idx[None, :], i_idx[:, None], i_idx[None, :]]
    vals, vecs = np.linalg.eigh(ab)
    nroots = min(nroots, len(vals))
    return StabilityResult(
        eigenvalues=vals[:nroots],
        modes=np.ascontiguousarray(vecs[:, :nroots].T),
        pairs=np.stack([i_idx, a_idx], axis=1),
        stable=bool(vals[0] > tol),
    )


def rotate_towards(scf_sol, result: StabilityResult, root: int = 0,
                   step: float = 0.3):
    """Rotate the MOs along an unstable Hessian mode.

    Returns a per-spin ``(2, nao, nmo)`` coefficient set
    ``C' = C exp(step * K)`` (K antisymmetric from the mode amplitudes),
    ready to seed a downhill re-converge via the density it implies —
    see :func:`stable_scf`.  The solution's MOs must map 1:1 onto the
    spin orbitals of ``result`` (no frozen reduction in between).
    """
    c = np.asarray(scf_sol.mo_coeff)
    if c.ndim == 2:
        c = np.stack([c, c])
    nmo = c.shape[-1]
    kappa = np.zeros((2, nmo, nmo))
    mode = result.modes[root]
    for (i, a), x in zip(result.pairs, mode):
        s, p, q = int(i) % 2, int(i) // 2, int(a) // 2
        kappa[s, p, q] += x
        kappa[s, q, p] -= x
    c_new = np.empty_like(c)
    for s in range(2):
        vals, vecs = np.linalg.eigh(1j * kappa[s])
        expk = (vecs * np.exp(-1j * step * vals)) @ vecs.conj().T
        c_new[s] = c[s] @ expk.real
    return c_new


def stable_scf(engine, sol=None, max_attempts: int = 3, step: float = 0.4,
               tol: float = -1e-6, **kernel_kwargs):
    """Converge to an internally stable SCF solution.

    Runs (or takes) a converged solution, checks A+B stability, and on
    instability rotates along the lowest mode and re-converges from the
    rotated density, up to ``max_attempts`` times.  The rotation step is
    adaptive: Roothaan+DIIS iterations are not energy descent and can
    flow back to the saddle from inside its basin, so if the re-converged
    energy did not drop the step is doubled (up to pi/2) before giving
    up on the attempt.  Returns ``(solution, stability_result)``.
    """
    from ..ham.builder import HamiltonianBuilder

    if sol is None:
        sol = engine.kernel(**kernel_kwargs)
    for _ in range(max_attempts):
        _, h1, h2 = HamiltonianBuilder(sol, 0.0).build()
        occ = np.asarray(sol.mo_occ)
        if occ.ndim == 1:
            occ = np.stack([occ / 2.0, occ / 2.0])
        k = occ.shape[-1]
        occ_mask = np.zeros(2 * k, dtype=bool)
        occ_mask[::2] = occ[0] > 0
        occ_mask[1::2] = occ[1] > 0
        stab = run_stability(h1, h2, occ_mask, tol=tol)
        if stab.stable:
            return sol, stab
        improved = None
        s = step
        while s <= np.pi / 2 + 1e-12:
            c_new = rotate_towards(sol, stab, step=s)
            # per-spin 0/1 occupations (restricted solutions store 0/2)
            dm0 = np.einsum("spk,sk,sqk->spq", c_new, occ, c_new)
            trial = engine.kernel(dm0=dm0, **kernel_kwargs)
            if trial.e_tot < sol.e_tot - 1e-10:
                improved = trial
                break
            s *= 2.0
        if improved is None:
            return sol, stab  # mode following failed to leave the saddle
        sol = improved
    return sol, stab
