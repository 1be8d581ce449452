"""Spin-generic SCF with DIIS in a ``lax.while_loop``.

All state lives in fixed-shape arrays: density matrices carry a leading spin
axis ``(2, n, n)`` (a "restricted" calculation is the exact alpha==beta
fixed point, reported with doubled occupations), the DIIS history is a
static ring buffer, and convergence is a predicate of the loop carry. The
whole SCF — Fock builds (MXU GEMMs over ERI supermatrices), XC quadrature,
eigendecompositions, DIIS extrapolation — is one compiled XLA program per
(molecule, method) signature; one J/K build per cycle.

Replaces: PySCF ``scf.UHF/UKS`` kernels (reference driver.py:112,163) and the
Python-loop Huzinaga SCF (reference huzinaga_scf.py:154-199).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["SCFResult", "run_scf", "make_rdm1", "lowdin_x", "eigh_refined"]


class SCFResult(NamedTuple):
    """Converged SCF data (always spin-resolved internally)."""

    mo_coeff: jnp.ndarray  # (2, n, n)
    mo_energy: jnp.ndarray  # (2, n)
    mo_occ: jnp.ndarray  # (2, n) of 0/1 (electrons per spin orbital)
    dm: jnp.ndarray  # (2, n, n)
    e_elec: jnp.ndarray  # electronic energy (add nuclear repulsion for e_tot)
    converged: jnp.ndarray
    fock: jnp.ndarray  # (2, n, n) final Fock (incl. v_emb + huzinaga)
    huzinaga_op: jnp.ndarray  # (2, n, n) final Huzinaga operator (zeros if off)
    n_iter: jnp.ndarray


def make_rdm1(mo_coeff, mo_occ):
    """D_sigma = C diag(occ) C^T with 0/1 spin-orbital occupations."""
    return jnp.einsum("spi,si,sqi->spq", mo_coeff, mo_occ, mo_coeff)


def eigh_refined(a):
    """Symmetric eigh with one Newton refinement of the eigenvectors (TPU).

    XLA's TPU eigh under f64 emulation returns f64-grade eigenVALUES and
    orthonormality (~1e-13) but only f32-grade eigenVECTOR residuals
    (|A V - V W| ~ 1e-7 |A|, measured round 3).  In the SCF loop that
    floors the DIIS error matrix X^T(FDS-SDF)X at ~4e-8 — the density
    converges but DIIS keeps extrapolating over pure eigenvector noise and
    settles into a ~1e-6 limit cycle (water/STO-3G: 100 cycles,
    1.3e-6 Ha high).  One first-order correction built from f64-true GEMMs
    (those ARE accurate on TPU, ~1e-15) pushes the residual to
    ~eps^2/gap: with R = V^T A V nearly diagonal, the skew update
    Delta_ij = R_ij / (R_jj - R_ii) annihilates the off-diagonal coupling
    to second order, and one Newton orthonormalisation V (3I - V^T V)/2
    restores orthogonality.  Near-degenerate pairs keep Delta = 0:
    intra-block rotations do not change any downstream subspace projector
    (densities, DIIS errors), so the guard is safe.

    Off-TPU the plain eigh is already ~1e-15 and is returned untouched
    (keeps CPU programs bit-identical).
    """
    w, v = jnp.linalg.eigh(a)
    if jax.default_backend() != "tpu":
        return w, v
    return newton_refine_eigh(a, v)


def newton_refine_eigh(a, v):
    """One Newton pass improving an approximate eigenbasis ``v`` of
    symmetric ``a`` (see :func:`eigh_refined` for when and why)."""
    r = jnp.einsum("...pi,...pq,...qj->...ij", v, a, v)
    w = jnp.diagonal(r, axis1=-2, axis2=-1)
    d = w[..., None, :] - w[..., :, None]  # d_ij = w_j - w_i
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True)[..., None]
    safe = jnp.abs(d) > 1e-8 * scale
    delta = jnp.where(safe, r / jnp.where(safe, d, 1.0), 0.0)
    v = v + jnp.einsum("...ik,...kj->...ij", v, delta)
    vtv = jnp.einsum("...ki,...kj->...ij", v, v)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    v = jnp.einsum("...ik,...kj->...ij", v, 1.5 * eye - 0.5 * vtv)
    return w, v


def lowdin_x(s):
    """S^{-1/2} via eigh (reference huzinaga_scf.py:128 uses scipy)."""
    w, v = eigh_refined(s)
    return (v * (1.0 / jnp.sqrt(w))[None, :]) @ v.T


def huzinaga_operator(fock, dm_occ_s, dm_virt_s):
    """-(F D S + S D F) per spin, plus the virtual-space variant.

    Matches reference huzinaga_scf.py:65-90 with per-spin densities (the
    reference's -0.5 restricted factor is absorbed by passing per-spin =
    total/2 densities).
    """
    fds_occ = jnp.einsum("sij,sjk->sik", fock, dm_occ_s)
    huz = -(fds_occ + jnp.swapaxes(fds_occ, -1, -2))
    fds_virt = jnp.einsum("sij,sjk->sik", fock, dm_virt_s)
    huz_virt = -(
        fds_virt
        + jnp.swapaxes(fds_virt, -1, -2)
        - 2.0 * jnp.einsum("sij,sjk->sik", jnp.swapaxes(dm_virt_s, -1, -2), fds_virt)
    )
    return huz + huz_virt


def run_scf(
    *,
    hcore,  # (n, n) or (2, n, n)
    s,  # (n, n)
    eri_j=None,  # (n*n, n*n) supermatrix for J: (ij|kl)
    eri_k=None,  # (n*n, n*n) supermatrix for K: (ik|jl)
    jk_fn: Optional[Callable] = None,  # dm (2,n,n) -> (j (n,n), k (2,n,n))
    jk_fn_fast: Optional[Callable] = None,  # f32 J/K for incremental builds
    rebase_every: int = 8,  # full-precision Fock rebuild period (incremental)
    xc_fn_fast: Optional[Callable] = None,  # f32 XC for coarse iterations
    xc_switch_tol: float = 1e-4,  # |dDM| below which in-loop XC goes f64
    nelec,  # (n_alpha, n_beta) — static
    v_emb=None,  # (2, n, n) embedding potential added to hcore
    xc_fn: Optional[Callable] = None,  # dm -> (exc, vxc (2,n,n))
    hyb: float = 1.0,  # HF-exchange fraction (1.0 = HF, e.g. 0.2 = B3LYP)
    dm_env_occ=None,  # (2, n, n) Huzinaga occupied env density (per spin)
    dm_env_virt=None,  # (2, n, n) Huzinaga virtual env density (per spin)
    dm0=None,  # (2, n, n) initial guess
    conv_tol: float = 1e-6,
    dm_conv_tol: float = 1e-6,
    max_cycle: int = 50,
    diis_space: int = 8,
    use_diis: bool = True,
    level_shift: float = 0.0,  # virtual-orbital level shift (Ha)
    rohf: bool = False,  # restricted-open-shell: shared spatial orbitals
    grad_cycles: int = 0,  # extra post-convergence cycles for jvp tangents
) -> SCFResult:
    """Run SCF to convergence and return an :class:`SCFResult`.

    Fock matrix: ``F_s = hcore + v_emb + J(D_tot) + Vxc_s - hyb*K(D_s)
    + Huz(F)``. Energies follow the reference's embedded conventions
    (huzinaga_scf.py:14-62): the Huzinaga term enters the one-body energy
    in full; ``v_emb`` is treated as part of the core Hamiltonian.

    ``rohf=True`` runs restricted-open-shell SCF (ROHF, or ROKS with an
    ``xc_fn``): both spins share spatial orbitals, enforced by replacing
    the per-spin Fock pair with Roothaan's single effective Fock before
    DIIS/diagonalisation. Energies still use the true per-spin Fock
    expression, and the returned :attr:`SCFResult.fock` is the per-spin
    pair.

    Incremental mixed precision (``jk_fn_fast``): since J/K are linear in
    the density, each cycle contracts only the density *change* against the
    ERIs in f32 (MXU-rate on TPU, where f64 GEMMs are software-emulated)
    and accumulates onto an f64 reference Fock: ``J(D_i) = J(D_ref) +
    J32(D_i - D_ref)``. The f32 absolute error scales with ``|dD|``, which
    decays geometrically as SCF converges, and a full-precision rebuild
    every ``rebase_every`` cycles (plus the final consistency build) bounds
    the accumulated drift — converged energies agree with the all-f64 path
    to ~1e-9 Ha while paying emulated-f64 GEMM cost only 1/rebase_every of
    the time.

    ``xc_fn_fast`` likewise moves the XC quadrature of *coarse* iterations
    (density change above ``xc_switch_tol``) to f32; once the density
    settles, a ``lax.cond`` switches the same compiled loop to the f64
    ``xc_fn`` so the convergence test is not floored by f32 XC noise
    (~5e-7 on the exchange-correlation energy).
    """
    n = s.shape[-1]
    if hcore.ndim == 2:
        hcore = jnp.stack([hcore, hcore])
    if v_emb is None:
        v_emb = jnp.zeros((2, n, n), hcore.dtype)
    elif v_emb.ndim == 2:
        v_emb = jnp.stack([v_emb, v_emb])
    v_emb = v_emb.astype(hcore.dtype)
    x = lowdin_x(s)
    h_eff = hcore + v_emb

    use_huz = dm_env_occ is not None
    if use_huz:
        dm_occ_s = jnp.einsum("sij,jk->sik", dm_env_occ, s)
        if dm_env_virt is None:
            dm_virt_s = jnp.zeros_like(dm_occ_s)
        else:
            dm_virt_s = jnp.einsum("sij,jk->sik", dm_env_virt, s)

    na, nb = int(nelec[0]), int(nelec[1])
    occ = jnp.stack([
        (jnp.arange(n) < na).astype(s.dtype),
        (jnp.arange(n) < nb).astype(s.dtype),
    ])

    if jk_fn is not None:
        get_jk = jk_fn
    else:
        def get_jk(dm):
            d_tot = (dm[0] + dm[1]).reshape(-1)
            j = (eri_j @ d_tot).reshape(n, n)
            k = (eri_k @ dm.reshape(2, n * n).T).T.reshape(2, n, n)
            return j, k

    def assemble_fock(dm, j, k, xc_eval=None):
        """(F incl. huz, huz, e_elec) from a density and its J/K pair."""
        vhf = j[None] - hyb * k
        xc = xc_fn if xc_eval is None else xc_eval
        if xc is not None:
            exc, vxc = xc(dm)
            vhf = vhf + vxc
        else:
            exc = 0.0
        f0 = h_eff + vhf
        if use_huz:
            huz = huzinaga_operator(f0, dm_occ_s, dm_virt_s)
            f = f0 + huz
        else:
            huz = jnp.zeros_like(f0)
            f = f0
        e1 = jnp.einsum("sij,sji->", h_eff + huz, dm)
        ecoul = 0.5 * jnp.einsum("ij,ji->", j, dm[0] + dm[1])
        ex_hf = -0.5 * hyb * jnp.einsum("sij,sji->", k, dm)
        return f, huz, e1 + ecoul + ex_hf + exc

    def fock_and_energy(dm, xc_eval=None):
        """One J/K (+XC) build -> (F, huz, e_elec of dm)."""
        j, k = get_jk(dm)
        return assemble_fock(dm, j, k, xc_eval=xc_eval)

    def eig_fock(f):
        f_ortho = jnp.einsum("pi,spq,qj->sij", x, f, x)
        mo_e, c_ortho = eigh_refined(f_ortho)
        return mo_e, jnp.einsum("pi,sij->spj", x, c_ortho)

    def roothaan_effective(f, dm):
        """Roothaan's single effective Fock for ROHF/ROKS, stacked onto the
        spin axis so the rest of the loop (DIIS, eigh, occupations) is
        unchanged — both spins then diagonalise the same matrix and share
        spatial orbitals.  Projector form (closed = beta-occupied space,
        open = alpha-minus-beta, virtual = alpha-unoccupied):
        diagonal blocks couple through (Fa+Fb)/2, closed-open through Fb,
        open-virtual through Fa, closed-virtual through (Fa+Fb)/2."""
        fc = 0.5 * (f[0] + f[1])
        pc = dm[1] @ s
        po = (dm[0] - dm[1]) @ s
        pv = jnp.eye(n, dtype=f.dtype) - dm[0] @ s
        feff = (0.5 * (pc.T @ fc @ pc + po.T @ fc @ po + pv.T @ fc @ pv)
                + po.T @ f[1] @ pc + po.T @ f[0] @ pv + pv.T @ fc @ pc)
        feff = feff + feff.T
        return jnp.stack([feff, feff])

    # initial guess: core Hamiltonian (+projectors), as in the reference
    # Huzinaga loop (huzinaga_scf.py:139-148).
    if dm0 is None:
        f_init = h_eff
        if use_huz:
            f_init = f_init + huzinaga_operator(f_init, dm_occ_s, dm_virt_s)
        _, c0 = eig_fock(f_init)
        dm0 = make_rdm1(c0, occ)

    m = diis_space

    def diis_extrapolate(hist_f, hist_e, nfill):
        """Pulay extrapolation over the filled slots of the ring buffer."""
        flat_e = hist_e.reshape(m, -1)
        b = flat_e @ flat_e.T
        filled = (jnp.arange(m) < nfill).astype(b.dtype)
        b = b * (filled[:, None] * filled[None, :]) + jnp.diag(1.0 - filled)
        big = jnp.zeros((m + 1, m + 1), b.dtype)
        big = big.at[:m, :m].set(b)
        big = big.at[:m, m].set(filled)
        big = big.at[m, :m].set(filled)
        rhs = jnp.zeros(m + 1, b.dtype).at[m].set(1.0)
        # eigh-based pseudo-inverse, not jnp.linalg.lstsq: the f32 lstsq
        # (SVD) lowering inside a while_loop crashes the TPU AOT compiler
        # (XLA TransposeFolding SIGABRT, bisected round 3 in the CCSD
        # sweep); eigh compiles in-loop on TPU (eig_fock below does it
        # every cycle) and is the same pinv for this symmetric system.
        # Refined eigh + a lindep-style relative cut: once the residuals
        # hit the device noise floor, B is a nearly singular noise Gram
        # matrix — inverting its noise directions produces wild
        # extrapolation coefficients that kick the density off the fixed
        # point (the TPU limit-cycle failure mode, round 3).
        ew, ev = eigh_refined(big)
        cut = jnp.max(jnp.abs(ew)) * max(1e-12, (m + 1) * float(jnp.finfo(b.dtype).eps))
        inv_ew = jnp.where(jnp.abs(ew) > cut, 1.0 / ew, 0.0)
        coef = ((ev * inv_ew[None, :]) @ (ev.T @ rhs))[:m] * filled
        # stop_gradient: the mixing weights carry no derivative at the
        # fixed point (the history Focks coincide and the coefficients sum
        # to 1, so sum_h dcoef_h F_h = F d(1) = 0), while differentiating
        # the eigh of the padded B matrix — whose empty ring-buffer slots
        # give exactly degenerate eigenvalues — NaNs every jvp through the
        # loop (forward-mode geometry derivatives, parallel/embed_path).
        coef = jax.lax.stop_gradient(coef)
        return jnp.einsum("h,hsij->sij", coef, hist_f)

    def cond(carry):
        return jnp.logical_and(
            carry["cycle"] < max_cycle, jnp.logical_not(carry["conv"])
        )

    use_inc = jk_fn_fast is not None
    use_xc_fast = xc_fn_fast is not None and xc_fn is not None

    def make_step(inc: bool, xcfast: bool, diis: bool | None = None,
                  damp: float = 0.0):
        """Build one SCF step closure; ``inc=False, xcfast=False`` is the
        pure full-precision step used by the polish loop below. ``diis``
        overrides the run-level ``use_diis`` (the tangent-polish cycles run
        DIIS-free so the forward-mode tangents follow the plain Roothaan
        contraction instead of re-mixing stale history-Fock tangents).
        ``damp`` mixes the old density into the update,
        ``D <- (1-damp) G(D) + damp D``: the fixed point (and hence the
        implicit-function tangent ``(I-J)^{-1} dG``) is unchanged, but any
        Jacobian eigenvalue in ``(-(1+damp)/(1-damp), 1)`` becomes
        contractive — stabilising DIIS-free iteration at fixed points where
        undamped Roothaan oscillates (small-gap / stretched geometries)."""
        step_diis = use_diis if diis is None else diis

        def step(carry):
            dm = carry["dm"]
            if xcfast:
                def xc_eval(d):
                    return jax.lax.cond(
                        carry["ddm"] > xc_switch_tol,
                        lambda dd: tuple(
                            o.astype(dd.dtype)
                            for o in xc_fn_fast(dd.astype(jnp.float32))
                        ),
                        xc_fn,
                        d,
                    )
            else:
                xc_eval = None
            if inc:
                # incremental J/K: f32 contraction of the density change,
                # accumulated onto the f64 reference; periodic f64 rebase
                jd, kd = jk_fn_fast((dm - carry["dm_ref"]).astype(jnp.float32))
                j_inc = carry["j_ref"] + jd.astype(dm.dtype)
                k_inc = carry["k_ref"] + kd.astype(dm.dtype)
                do_rebase = carry["cycle"] % rebase_every == 0
                j, k = jax.lax.cond(
                    do_rebase, get_jk, lambda _: (j_inc, k_inc), dm
                )
                f, huz, e_cur = assemble_fock(dm, j, k, xc_eval=xc_eval)
            else:
                f, huz, e_cur = fock_and_energy(dm, xc_eval=xc_eval)
            if rohf:
                # the per-spin error X^T(F_eff D_s S - S D_s F_eff)X below
                # covers every coupling block: D_beta tests closed-open and
                # closed-virtual, D_alpha tests open-virtual
                f = roothaan_effective(f, dm)
            # DIIS error: X^T (FDS - SDF) X per spin
            fds = jnp.einsum("sij,sjk,kl->sil", f, dm, s)
            err = jnp.einsum(
                "pi,spq,qj->sij", x, fds - jnp.swapaxes(fds, -1, -2), x
            )
            slot = carry["cycle"] % m
            hist_f = carry["hist_f"].at[slot].set(f)
            hist_e = carry["hist_e"].at[slot].set(err)
            nfill = jnp.minimum(carry["nfill"] + 1, m)
            if step_diis:
                f_diis = diis_extrapolate(hist_f, hist_e, nfill)
                f_use = jnp.where(carry["cycle"] > 0, f_diis, f)
            else:
                f_use = f
            if level_shift:
                # F' = F + lambda (S - S D_s S): shifts only virtual
                # eigenvalues (S D_s S C_occ = S C_occ for the occupied
                # span), damping occupied<->virtual oscillation without
                # moving the fixed point
                sds = jnp.einsum("ij,sjk,kl->sil", s, dm, s)
                f_use = f_use + level_shift * (s[None] - sds)
            mo_e, c = eig_fock(f_use)
            dm_new = make_rdm1(c, occ)
            if damp:
                dm_new = (1.0 - damp) * dm_new + damp * dm
            de = jnp.abs(e_cur - carry["e"])
            ddm = jnp.max(jnp.linalg.norm(dm_new - dm, axis=(-2, -1)))
            conv = jnp.logical_and(de < conv_tol, ddm < dm_conv_tol)
            out = {
                "cycle": carry["cycle"] + 1, "dm": dm_new, "e": e_cur,
                "conv": conv, "hist_f": hist_f, "hist_e": hist_e,
                "nfill": nfill, "c": c, "mo_e": mo_e, "ddm": ddm,
            }
            if inc:
                out.update(dm_ref=dm, j_ref=j, k_ref=k)
            return out

        return step

    step = make_step(use_inc, use_xc_fast)

    dt = h_eff.dtype  # f64 default; f32 for the mixed-precision warm-up
    carry0 = {
        "cycle": jnp.array(0), "dm": dm0.astype(dt), "e": jnp.array(jnp.inf, dt),
        "conv": jnp.array(False),
        "hist_f": jnp.zeros((m, 2, n, n), dt), "hist_e": jnp.zeros((m, 2, n, n), dt),
        "nfill": jnp.array(0),
        "c": jnp.zeros((2, n, n), dt), "mo_e": jnp.zeros((2, n), dt),
        "ddm": jnp.array(jnp.inf, dt),
    }
    if use_inc:
        # cycle 0 hits the rebase branch, so the zero reference is never used
        carry0.update(
            dm_ref=jnp.zeros((2, n, n), dt),
            j_ref=jnp.zeros((n, n), dt),
            k_ref=jnp.zeros((2, n, n), dt),
        )
    out = jax.lax.while_loop(cond, step, carry0)

    if use_inc or use_xc_fast:
        # Full-precision polish: the mixed-precision loop's fixed point
        # carries accumulated f32 contraction noise (measured ~2.5e-6 Ha on
        # water HF, TPU round 3: the density random-walks in a noise ball
        # and the de/ddm test can trip far from the true fixed point).  A
        # short pure-f64 loop seeded from the mixed-precision density lands
        # on the exact f64 fixed point in a few cycles — the mixed loop is
        # thereby an aggressive warm start, not the final arbiter.
        polish = make_step(False, False)
        carry1 = {
            "cycle": jnp.array(0), "dm": out["dm"], "e": out["e"],
            "conv": jnp.array(False),
            "hist_f": jnp.zeros((m, 2, n, n), dt),
            "hist_e": jnp.zeros((m, 2, n, n), dt),
            "nfill": jnp.array(0),
            "c": out["c"], "mo_e": out["mo_e"],
            "ddm": jnp.array(jnp.inf, dt),
        }
        out2 = jax.lax.while_loop(cond, polish, carry1)
        out2["cycle"] = out["cycle"] + out2["cycle"]
        out = out2

    if grad_cycles:
        # Tangent polish for forward-mode differentiation: the while_loop
        # stops when the PRIMAL converges, but jvp tangents follow the same
        # contraction one step behind — the returned density's tangent can
        # sit ~1e-5 off the implicit-function derivative (first-order
        # visible in any non-stationary consumer, e.g. the SPADE split or
        # mu*S*D_env*S in parallel/embed_path). A fixed number of extra
        # full-precision cycles is a primal no-op on a converged density
        # and lets the tangents settle at the same geometric rate.
        # Gated on convergence (an unconverged density would just be walked
        # further by DIIS-free steps) and damped (0.5 keeps the polish
        # contractive at fixed points where undamped Roothaan iteration
        # oscillates; the damping leaves both the fixed point and the
        # implicit-function tangent unchanged, see make_step).
        extra = make_step(False, False, diis=False, damp=0.5)
        conv_main, cycle_main = out["conv"], out["cycle"]
        out = jax.lax.cond(
            conv_main,
            lambda c_: jax.lax.fori_loop(0, grad_cycles,
                                         lambda i, c2: extra(c2), c_),
            lambda c_: c_,
            out,
        )
        # the polish steps recompute conv/cycle internally; report the
        # actual while_loop outcome, not the last DIIS-free step's
        out["conv"], out["cycle"] = conv_main, cycle_main

    # final consistent energy/Fock for the converged density
    f_fin, huz_fin, e_fin = fock_and_energy(out["dm"])
    return SCFResult(
        mo_coeff=out["c"],
        mo_energy=out["mo_e"],
        mo_occ=occ,
        dm=out["dm"],
        e_elec=e_fin,
        converged=out["conv"],
        fock=f_fin,
        huzinaga_op=huz_fin,
        n_iter=out["cycle"],
    )
