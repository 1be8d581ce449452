"""TDA-TDDFT with the exact exchange-correlation kernel by autodiff.

Beyond the reference (UCL-CCS/Nbed has no excited-state machinery at
all) and beyond this package's own :func:`nbed_tpu.solvers.run_cis`:
``run_cis`` applies 100% HF exchange to whatever orbitals it is given,
which on a Kohn-Sham reference is CIS-on-KS-orbitals, not TDDFT. This
module builds the true TDA response of the (possibly embedded) KS
determinant,

    A[(ia),(jb)] = F_ab d_ij - F_ij d_ab + (ia|jb) - hyb (ij|ab)
                   + (ia| f_xc |jb),

with the XC kernel f_xc = d²E_xc/dρ² obtained EXACTLY from the
autodiff XC layer: the potential closure ``vxc(dm)`` is already the
JAX gradient of E_xc, so its directional derivative along an AO
transition density — one ``jax.jvp`` — is the kernel contraction, for
every functional in :mod:`nbed_tpu.dft.functionals` (LDA/GGA/meta-GGA,
global and range-separated hybrids: the engine folds hyb*K + beta*K_LR
into its exchange supermatrix, so the RSH response kernel comes along
for free). No hand-derived f_xc formulas anywhere.

The full TDA matrix is assembled by ``vmap``-ing the matrix-vector
product over unit vectors (one batched XLA program: J/K GEMMs + the
kernel jvp), then diagonalised on the host — response spaces here are
n_occ x n_virt of an (embedded) active region, i.e. tiny next to the
integral pipeline.

For an embedded reference the environment enters through the fixed
v_emb (and Huzinaga) operators in the ground-state Fock; a frozen
environment has no response, so those terms are static — exactly the
WF-in-DFT excited-state picture.
"""

import numpy as np

from .cis import CISResult

__all__ = ["run_tddft_tda"]


def _davidson(matvec_block, diag, nroots, max_subspace=120,
              conv_tol=1e-8, max_iter=60):
    """Block Davidson for the symmetric TDA matrix, matrix-free.

    ``matvec_block``: (m, N) -> (m, N) row-wise A application (one
    batched XLA dispatch per iteration). ``diag``: (N,) preconditioner
    (orbital-energy differences). Returns (omega (nroots,),
    x (N, nroots)) like ``np.linalg.eigh`` columns.
    """
    n = diag.shape[0]
    nroots = min(nroots, n)
    # seed with the lowest-diagonal unit vectors (orthonormal)
    seed = np.argsort(diag)[: min(max(2 * nroots, nroots + 2), n)]
    v = np.zeros((n, len(seed)))
    v[seed, np.arange(len(seed))] = 1.0
    av = matvec_block(v.T).T  # (n, k)

    theta = ritz = None
    for _ in range(max_iter):
        h = 0.5 * (v.T @ av + av.T @ v)
        vals, s = np.linalg.eigh(h)
        theta, s = vals[:nroots], s[:, :nroots]
        ritz = v @ s  # (n, nroots), orthonormal columns
        a_ritz = av @ s
        resid = a_ritz - ritz * theta[None, :]
        rnorm = np.linalg.norm(resid, axis=0)
        if np.all(rnorm < conv_tol):
            return theta, ritz

        # precondition unconverged residuals, orthogonalize, append
        new_dirs = []
        basis = v
        for r in range(nroots):
            if rnorm[r] < conv_tol:
                continue
            denom = diag - theta[r]
            denom = np.where(np.abs(denom) < 1e-8,
                             np.where(denom >= 0, 1e-8, -1e-8), denom)
            d = resid[:, r] / denom
            for _ in range(2):  # twice for orthogonality at f64
                d = d - basis @ (basis.T @ d)
                for nd_col in new_dirs:
                    d = d - nd_col * (nd_col @ d)
            norm = np.linalg.norm(d)
            if norm > 1e-10:
                new_dirs.append(d / norm)
        if not new_dirs:
            return theta, ritz
        add = np.stack(new_dirs, axis=1)

        if v.shape[1] + add.shape[1] > max_subspace:
            # thick restart: Ritz vectors (+ known products) carry over
            for _ in range(2):
                add = add - ritz @ (ritz.T @ add)
            add, _ = np.linalg.qr(add)
            v, av = ritz, a_ritz
        v = np.concatenate([v, add], axis=1)
        av = np.concatenate([av, matvec_block(add.T).T], axis=1)

    import warnings

    warnings.warn(
        f"TDA Davidson did not converge in {max_iter} iterations "
        f"(worst residual {float(np.max(rnorm)):.2e} > {conv_tol:.0e}); "
        "returning the current Ritz values.", RuntimeWarning, stacklevel=2)
    return theta, ritz


def run_tddft_tda(scf_sol, nroots: int | None = None,
                  method: str = "auto", max_subspace: int = 120,
                  conv_tol: float = 1e-8, max_iter: int = 60) -> CISResult:
    """TDA excitation spectrum of an :class:`SCFSolution`.

    For an ``xc=None`` (Hartree-Fock) engine this reduces exactly to
    CIS; with a functional it is TDA-TDDFT with the autodiff f_xc
    kernel. Works on global and embedded solutions (v_emb / Huzinaga
    operators are folded into the ground-state Fock; truncated or
    non-canonical MO sets are handled by using the full F_ij / F_ab
    blocks rather than assuming diagonal orbital energies).

    ``method``: "dense" vmaps the matvec over all unit vectors and
    diagonalises the full A (exact, right for embedded actives);
    "davidson" runs a matrix-free block Davidson — each iteration is
    one batched XLA program applying the J/K GEMMs + f_xc jvp to the
    current trial block, so large response spaces never materialise A.
    "auto" picks Davidson when ``nroots`` is set and the pair space is
    large (> ``max_subspace``).

    Returns a :class:`CISResult` (interleaved spin-orbital ``pairs``,
    even = alpha), so :func:`oscillator_strengths` and
    :func:`spin_labels` apply unchanged.
    """
    import jax
    import jax.numpy as jnp

    eng = scf_sol.engine
    n = eng.mol.nao
    c = np.asarray(scf_sol.mo_coeff)
    if c.ndim == 2:
        c = np.stack([c, c])
    occ = np.asarray(scf_sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])

    co = [jnp.asarray(c[s][:, occ[s] > 0]) for s in range(2)]
    cv = [jnp.asarray(c[s][:, occ[s] <= 0]) for s in range(2)]
    shapes = [(co[s].shape[1], cv[s].shape[1]) for s in range(2)]
    sizes = [no * nv for no, nv in shapes]
    if sum(sizes) == 0:
        raise ValueError("No single excitations exist for this solution.")

    # ground-state density and Fock (v_emb / Huzinaga included)
    dm0 = jnp.asarray(scf_sol.make_rdm1())
    xc_fn, hyb = eng._xc
    veff = eng.get_veff(dm0)
    fock = np.asarray(eng.hcore)[None] + np.asarray(veff.matrix)
    if scf_sol.v_emb is not None:
        fock = fock + np.asarray(scf_sol.v_emb)
    if scf_sol.huzinaga_op is not None:
        fock = fock + np.asarray(scf_sol.huzinaga_op)
    fock = jnp.asarray(fock)
    f_oo = [co[s].T @ fock[s] @ co[s] for s in range(2)]
    f_vv = [cv[s].T @ fock[s] @ cv[s] for s in range(2)]

    if eng.density_fitting:
        # DF J/K of the (non-symmetric) transition density — the exact
        # O(nao^4) supermatrices never materialise. _df_k_spin's GEMM
        # chain B_ikP d_kl B_jlP is exactly the TDA exchange contraction
        # (mu nu|la si) d_nu,si for any d, symmetric or not.
        from ..scf.engine import _df_k_spin

        b = eng._df_b
        b_lr = eng._df_b_lr if eng._rsh is not None else None

        def jk_fn(d):
            j = jnp.einsum("abP,P->ab",
                           b, jnp.einsum("abP,ab->P", b, d[0] + d[1]))
            k = jnp.stack([_df_k_spin(b, d[0]), _df_k_spin(b, d[1])])
            if b_lr is not None:  # fold hyb*K + beta*K_LR as the engine does
                k_lr = jnp.stack([_df_k_spin(b_lr, d[0]),
                                  _df_k_spin(b_lr, d[1])])
                k = eng._xc_meta[1] * k + eng._rsh[0] * k_lr
            return j, k
    else:
        eri_j, eri_k = eng.eri_j, eng.eri_k

        def jk_fn(d):
            j = (eri_j @ (d[0] + d[1]).reshape(-1)).reshape(n, n)
            k = (eri_k @ d.reshape(2, -1).T).T.reshape(2, n, n)
            return j, k

    def matvec(x):
        xs = [x[: sizes[0]].reshape(shapes[0]),
              x[sizes[0]:].reshape(shapes[1])]
        d = jnp.stack([co[s] @ xs[s] @ cv[s].T for s in range(2)])
        j, k = jk_fn(d)
        v = j[None] - hyb * k
        if xc_fn is not None:
            # the XC kernel acts on the scalar density response, whose
            # AO matrix is the SYMMETRIZED transition density —
            # _chunk_math's gradient formula (2 * grad-phi D phi) is only
            # the true grad-rho for symmetric dm, so a raw non-symmetric
            # tangent would inject a spurious kernel term (verified:
            # ~6e-3 Ha eigenvalue shifts on water/B3LYP)
            d_sym = 0.5 * (d + jnp.swapaxes(d, -1, -2))
            _, dv = jax.jvp(lambda dd: xc_fn(dd)[1], (dm0,), (d_sym,))
            v = v + dv
        outs = [
            co[s].T @ v[s] @ cv[s]
            + xs[s] @ f_vv[s] - f_oo[s] @ xs[s]
            for s in range(2)
        ]
        return jnp.concatenate([o.reshape(-1) for o in outs])

    npairs = sum(sizes)
    batched = jax.jit(jax.vmap(matvec))
    if method == "auto":
        method = ("davidson" if nroots is not None and npairs > max_subspace
                  else "dense")

    if method == "dense":
        a_mat = np.asarray(batched(jnp.eye(npairs, dtype=dm0.dtype)))
        a_mat = 0.5 * (a_mat + a_mat.T)  # symmetric for real orbitals
        omega, x = np.linalg.eigh(a_mat)
        if nroots is not None:
            omega, x = omega[:nroots], x[:, :nroots]
    else:
        if nroots is None:
            raise ValueError("method='davidson' needs nroots.")
        # diagonal preconditioner: orbital-energy differences
        diag = np.concatenate([
            (np.diag(np.asarray(f_vv[s]))[None, :]
             - np.diag(np.asarray(f_oo[s]))[:, None]).ravel()
            for s in range(2)
        ])
        omega, x = _davidson(
            lambda block: np.asarray(batched(jnp.asarray(block))),
            diag, nroots, max_subspace=max_subspace,
            conv_tol=conv_tol, max_iter=max_iter,
        )

    # interleaved spin-orbital pair labels (even = alpha, odd = beta)
    pairs = []
    for s in range(2):
        oi = np.where(occ[s] > 0)[0]
        ai = np.where(occ[s] <= 0)[0]
        ii, aa = np.meshgrid(oi, ai, indexing="ij")
        pairs.append(np.stack([2 * ii.ravel() + s, 2 * aa.ravel() + s],
                              axis=1))
    pairs = np.concatenate(pairs, axis=0)

    e_ref_elec = float(scf_sol.e_tot - eng.energy_nuc())
    return CISResult(
        excitations=omega,
        amplitudes=np.ascontiguousarray(x.T),
        pairs=pairs,
        e_ref_elec=e_ref_elec,
    )
