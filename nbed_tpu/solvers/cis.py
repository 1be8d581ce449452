"""CIS / Tamm-Dancoff excited states on spin-orbital integrals.

Beyond the reference (UCL-CCS/Nbed stops at ground-state CCSD/FCI,
reference driver.py:1044-1135): configuration-interaction-singles
excitation energies for any SCF solution the framework produces —
global or *embedded* (WF-in-DFT excited states of the active region in
the environment's embedding potential), restricted or unrestricted,
with frozen spin orbitals folded in exactly.

Formulation (spin orbitals, M_s-conserving singles):

    A[(i,a),(j,b)] = f_ab d_ij - f_ij d_ab + <aj||ib>

with f the (embedded) Fock matrix implied by the integrals.  Eigenvalues
of A are excitation energies; this is exactly the Hamiltonian projected
onto the singly-excited determinant space, shifted by the reference
energy — the property the test suite verifies against
:func:`nbed_tpu.solvers.fci.sector_hamiltonian` with no external oracle.

The CIS matrix is tiny next to the integral/SCF hot path (npairs =
n_occ x n_virt, a few hundred for embedded actives), so assembly and the
symmetric eigensolve run on the host in f64; the expensive inputs (MO
integrals) come from the device-side builder pipeline.
"""

from dataclasses import dataclass

import numpy as np

from .ccsd import _antisymmetrized

__all__ = ["run_cis", "run_rpa", "CISResult", "RPAResult",
           "oscillator_strengths", "spin_labels"]


@dataclass
class CISResult:
    """Excitation energies (Ha, ascending) + singles amplitudes.

    ``pairs[p] = (i, a)`` gives the occupied/virtual *spin-orbital*
    indices (builder interleave: even = alpha, odd = beta) of amplitude
    column p; ``amplitudes[r]`` is the normalised eigenvector of root r.
    """

    excitations: np.ndarray  # (nroots,)
    amplitudes: np.ndarray  # (nroots, npairs)
    pairs: np.ndarray  # (npairs, 2)
    e_ref_elec: float

    def dominant(self, root: int, k: int = 3):
        """Top-k (i, a, amplitude) contributions of a root."""
        x = self.amplitudes[root]
        idx = np.argsort(-np.abs(x))[:k]
        return [(int(self.pairs[p, 0]), int(self.pairs[p, 1]), float(x[p]))
                for p in idx]



def _singles_frame(so_h1, so_h2, occ_mask):
    """Shared CIS/stability assembly.

    Returns ``(w, fock, e_ref_elec, i_idx, a_idx)``: the antisymmetrised
    MO integrals ``<pq||rs>``, the Fock matrix they imply, the reference
    electronic energy, and the M_s-conserving (occupied, virtual)
    spin-orbital index arrays (interleave: even = alpha, odd = beta).
    """
    occ_mask = np.asarray(occ_mask, dtype=bool)
    h1 = np.asarray(so_h1, dtype=np.float64)
    w = _antisymmetrized(np.asarray(so_h2, dtype=np.float64))  # <pq||rs>
    m = h1.shape[0]
    occ = np.where(occ_mask)[0]
    vir = np.where(~occ_mask)[0]

    # Fock implied by the integrals: f_pq = h_pq + sum_i <pi||qi>
    all_p = np.arange(m)
    fock = h1 + np.einsum("piqi->pq", w[np.ix_(all_p, occ, all_p, occ)])
    e_ref_elec = float(
        np.einsum("ii->", h1[np.ix_(occ, occ)])
        + 0.5 * np.einsum("ijij->", w[np.ix_(occ, occ, occ, occ)])
    )

    i_idx, a_idx = np.meshgrid(occ, vir, indexing="ij")
    keep = (i_idx % 2) == (a_idx % 2)
    i_idx, a_idx = i_idx[keep], a_idx[keep]
    if len(i_idx) == 0:
        raise ValueError("No M_s-conserving single excitations exist.")
    return w, fock, e_ref_elec, i_idx, a_idx


def _a_matrix(w, fock, i_idx, a_idx):
    """A[(ia),(jb)] = f[a,b] d_ij - f[i,j] d_ab + <a j || i b>."""
    a_mat = w[a_idx[:, None], i_idx[None, :], i_idx[:, None], a_idx[None, :]]
    a_mat = a_mat + np.where(i_idx[:, None] == i_idx[None, :],
                             fock[a_idx[:, None], a_idx[None, :]], 0.0)
    a_mat = a_mat - np.where(a_idx[:, None] == a_idx[None, :],
                             fock[i_idx[:, None], i_idx[None, :]], 0.0)
    return a_mat


def run_cis(so_h1, so_h2, occ_mask, nroots: int | None = None) -> CISResult:
    """CIS/TDA excitation spectrum from spin-orbital integrals.

    Args:
        so_h1: (M, M) one-body spin-orbital integrals (incl. any embedding
            potential — the builder output already folds v_emb in).
        so_h2: (M, M, M, M) a+a+aa coefficient tensor (builder's 0.5*h2).
        occ_mask: boolean (M,) — True for occupied spin orbitals.
        nroots: number of lowest excitations to return (default: all).

    Returns:
        :class:`CISResult` with ``len(excitations) == nroots``.
    """
    w, fock, e_ref_elec, i_idx, a_idx = _singles_frame(so_h1, so_h2, occ_mask)
    pairs = np.stack([i_idx, a_idx], axis=1)
    a_mat = _a_matrix(w, fock, i_idx, a_idx)

    omega, x = np.linalg.eigh(a_mat)
    if nroots is not None:
        omega, x = omega[:nroots], x[:, :nroots]
    return CISResult(
        excitations=omega,
        amplitudes=np.ascontiguousarray(x.T),
        pairs=pairs,
        e_ref_elec=e_ref_elec,
    )


@dataclass
class RPAResult(CISResult):
    """Full-RPA (TDHF) excitations; ``amplitudes`` holds X+Y rows.

    With the normalisation ``(X+Y)·(X−Y) = 1`` (i.e. X²−Y² = 1), the
    length-gauge transition dipole is ``Σ_ia (X+Y)_ia d_ia`` — so
    :func:`oscillator_strengths` works on this result unchanged.
    ``n_imaginary`` counts ω² < 0 roots (the RPA instability signature;
    nonzero exactly when :func:`nbed_tpu.solvers.run_stability` finds the
    underlying determinant unstable, since ω² is congruent to A+B).
    Imaginary roots are reported as ω = 0 at the bottom of the spectrum.
    """

    xmy: np.ndarray = None  # (nroots, npairs) X−Y rows
    n_imaginary: int = 0


def run_rpa(so_h1, so_h2, occ_mask, nroots: int | None = None) -> RPAResult:
    """Full RPA / TDHF excitation spectrum from spin-orbital integrals.

    Solves the non-Hermitian response problem

        [[A, B], [−B, −A]] [X, Y] = ω [X, Y],
        A[(ia),(jb)] = f_ab δ_ij − f_ij δ_ab + <aj||ib>,
        B[(ia),(jb)] = <ab||ij>,

    via the Hermitian reduction (A−B)^{1/2} (A+B) (A−B)^{1/2} Z = ω² Z
    (A−B is diagonal-dominant positive definite for any Aufbau
    determinant here). Setting B = 0 recovers :func:`run_cis` (TDA).
    Like CIS, the matrices are tiny next to the integral pipeline, so the
    solve runs on the host in f64.

    Beyond the reference: the reference has no excited-state machinery at
    all; this gives TDHF spectra of embedded Hamiltonians (the builder's
    ``so_h1`` already folds v_emb in).
    """
    w, fock, e_ref_elec, i_idx, a_idx = _singles_frame(so_h1, so_h2, occ_mask)
    pairs = np.stack([i_idx, a_idx], axis=1)
    a_mat = _a_matrix(w, fock, i_idx, a_idx)
    b_mat = w[a_idx[:, None], a_idx[None, :], i_idx[:, None], i_idx[None, :]]

    amb_vals, amb_vecs = np.linalg.eigh(a_mat - b_mat)
    # A−B indefinite is itself an instability (complex/non-real class):
    # the Hermitian reduction clamps those directions, so count them into
    # n_imaginary rather than silently absorbing them.
    n_imag_amb = int(np.sum(amb_vals < -1e-10))
    half = (amb_vecs * np.sqrt(np.maximum(amb_vals, 0.0))) @ amb_vecs.T
    w2, z = np.linalg.eigh(half @ (a_mat + b_mat) @ half)
    n_imag = int(np.sum(w2 < -1e-10)) + n_imag_amb
    omega = np.sqrt(np.maximum(w2, 0.0))

    safe = np.where(omega > 1e-12, omega, 1.0)
    xpy = (half @ z) / np.sqrt(safe)[None, :]  # (npairs, nroots)
    xmy = ((a_mat + b_mat) @ xpy) / safe[None, :]

    if nroots is not None:
        omega, xpy, xmy = omega[:nroots], xpy[:, :nroots], xmy[:, :nroots]
    return RPAResult(
        excitations=omega,
        amplitudes=np.ascontiguousarray(xpy.T),
        pairs=pairs,
        e_ref_elec=e_ref_elec,
        xmy=np.ascontiguousarray(xmy.T),
        n_imaginary=n_imag,
    )


def spin_labels(scf_sol, result: CISResult):
    """Singlet/triplet classification of CIS roots.

    Returns a list of ``(label, s)`` with
    ``s = 2 sum_ia X_aa[ia] X_bb[ia]`` over spatially matched pairs:
    +1 for a pure singlet, -1 for the M_s = 0 component of a pure
    triplet, in between ("mixed") for genuinely spin-contaminated
    references.  The alpha/beta amplitude comparison is made physical by
    aligning each spatial orbital's arbitrary per-spin sign through the
    AO overlap (UHF eigensolvers fix signs independently per spin, so
    the raw amplitude product can flip for individual orbitals).
    """
    c = np.asarray(scf_sol.mo_coeff)
    if c.ndim == 2:
        c = np.stack([c, c])
    s_ao = np.asarray(scf_sol.engine.s)
    align = np.sign(np.einsum("ui,uv,vi->i", c[0], s_ao, c[1]))

    lut = {}
    for p, (i, a) in enumerate(result.pairs):
        lut[(int(i) // 2, int(a) // 2, int(i) % 2)] = p
    out = []
    for x in result.amplitudes:
        s = 0.0
        for (io, ao, spin), p in lut.items():
            if spin == 0 and (io, ao, 1) in lut:
                s += (2.0 * x[p] * x[lut[(io, ao, 1)]]
                      * align[io] * align[ao])
        out.append(("singlet" if s > 0.5 else
                    "triplet" if s < -0.5 else "mixed", float(s)))
    return out


def _pair_dipoles(scf_sol, pairs):
    """(npairs, 3) MO-basis transition-dipole rows d_ia for given pairs."""
    from ..integrals.core import dipole_integrals

    dip = np.asarray(dipole_integrals(scf_sol.mol))  # (3, nao, nao)
    c = np.asarray(scf_sol.mo_coeff)
    if c.ndim == 2:
        c = np.stack([c, c])
    dip_mo = np.einsum("xuv,sui,svj->sxij", dip, c, c)  # per-spin MO dipoles
    i_idx, a_idx = pairs[:, 0], pairs[:, 1]
    spin = i_idx % 2  # == a_idx % 2 by construction
    return dip_mo[spin, :, i_idx // 2, a_idx // 2]  # (npairs, 3)


def oscillator_strengths(scf_sol, result: CISResult):
    """Length-gauge oscillator strengths f = (2/3) w |<0|r|I>|^2.

    ``scf_sol``'s MOs must map 1:1 onto the spin orbitals of ``result``
    (i.e. no frozen-orbital reduction between the SCF and the CIS run).
    For an :class:`RPAResult` the amplitudes are X+Y with
    ``(X+Y)·(X−Y) = 1``, which is exactly the length-gauge convention.

    Returns (f, mu): (nroots,) strengths and (nroots, 3) transition
    dipoles (a.u.).
    """
    pair_dip = _pair_dipoles(scf_sol, result.pairs)
    mu = result.amplitudes @ pair_dip  # (nroots, 3)
    f = (2.0 / 3.0) * result.excitations * np.sum(mu**2, axis=1)
    return f, mu


def polarizability(scf_sol, result: "RPAResult", omega: float = 0.0):
    """Dipole polarizability tensor alpha(omega) from the RPA spectrum.

    Sum-over-states over the full RPA solution,

        alpha_xy(omega) = 2 sum_r w_r mu_x^r mu_y^r / (w_r^2 − omega^2),

    which for the X+Y normalisation used here equals the closed-form
    linear response ``2 d^T (A+B − omega^2 (A−B)^{-1})^{-1}-type``
    contraction exactly (see tests): at omega=0,
    ``sum_r (X+Y)_r (X+Y)_r^T / w_r == (A+B)^{-1}``.

    Beyond the reference (no response properties of any kind there).
    Requires the full spectrum (``nroots=None`` in :func:`run_rpa`) for
    the identity to be exact.

    Returns a (3, 3) symmetric tensor in atomic units.
    """
    if getattr(result, "n_imaginary", 0):
        raise ValueError("RPA has imaginary modes; polarizability of an "
                         "unstable reference is undefined.")
    if result.amplitudes.shape[0] != result.pairs.shape[0]:
        raise ValueError(
            "polarizability needs the FULL RPA spectrum "
            f"({result.pairs.shape[0]} roots), got "
            f"{result.amplitudes.shape[0]}; rerun run_rpa with nroots=None.")
    pair_dip = _pair_dipoles(scf_sol, result.pairs)
    mu = result.amplitudes @ pair_dip  # (nroots, 3)
    w = result.excitations
    denom = w**2 - omega**2
    if np.any(np.abs(denom) < 1e-10):
        raise ValueError("omega hits an excitation pole.")
    weights = 2.0 * w / denom
    return np.einsum("r,rx,ry->xy", weights, mu, mu)
