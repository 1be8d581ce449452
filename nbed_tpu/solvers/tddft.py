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

from .cis import CISResult, RPAResult

__all__ = ["run_tddft_tda", "run_tddft_rpa"]


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

    fr = _response_frame(scf_sol)
    matvec = _tda_matvec(fr)
    npairs = sum(fr["sizes"])
    batched = jax.jit(jax.vmap(matvec))
    f_oo, f_vv, dm0 = fr["f_oo"], fr["f_vv"], fr["dm0"]
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

    return CISResult(
        excitations=omega,
        amplitudes=np.ascontiguousarray(x.T),
        pairs=fr["pairs"],
        e_ref_elec=fr["e_ref_elec"],
    )


def _response_frame(scf_sol):
    """Shared TDDFT response scaffolding for one SCF solution.

    Returns co/cv per spin, pair bookkeeping, the ground-state density,
    the engine's (xc_fn, hyb), MO Fock blocks (v_emb / Huzinaga folded
    in — a frozen environment has no response), and a ``jk_fn`` valid
    for NON-symmetric AO densities (DF engines use the B-factor GEMM
    chains — the O(nao^4) supermatrices never materialise; RSH engines
    get the folded hyb*K + beta*K_LR).
    """
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

    # interleaved spin-orbital pair labels (even = alpha, odd = beta)
    pairs = []
    for s in range(2):
        oi = np.where(occ[s] > 0)[0]
        ai = np.where(occ[s] <= 0)[0]
        ii, aa = np.meshgrid(oi, ai, indexing="ij")
        pairs.append(np.stack([2 * ii.ravel() + s, 2 * aa.ravel() + s],
                              axis=1))

    return {
        "co": co, "cv": cv, "shapes": shapes, "sizes": sizes, "dm0": dm0,
        "xc_fn": xc_fn, "hyb": hyb, "f_oo": f_oo, "f_vv": f_vv,
        "jk_fn": jk_fn, "pairs": np.concatenate(pairs, axis=0),
        "e_ref_elec": float(scf_sol.e_tot - eng.energy_nuc()),
    }


def _split(fr, x):
    return [x[: fr["sizes"][0]].reshape(fr["shapes"][0]),
            x[fr["sizes"][0]:].reshape(fr["shapes"][1])]


def _fock_part(fr, xs):
    return [xs[s] @ fr["f_vv"][s] - fr["f_oo"][s] @ xs[s] for s in range(2)]


def _project(fr, v, xs):
    import jax.numpy as jnp

    fp = _fock_part(fr, xs)
    outs = [fr["co"][s].T @ v[s] @ fr["cv"][s] + fp[s] for s in range(2)]
    return jnp.concatenate([o.reshape(-1) for o in outs])


def _kernel_jvp(fr, d_sym):
    """f_xc contraction along a SYMMETRIC AO density tangent.

    The XC kernel acts on the scalar density response; _chunk_math's
    gradient formula (2 * grad-phi D phi) is only the true grad-rho for
    symmetric dm, so callers must pre-symmetrize (a raw non-symmetric
    tangent injects a spurious ~6e-3 Ha term — regression-tested).
    """
    import jax

    return jax.jvp(lambda dd: fr["xc_fn"](dd)[1], (fr["dm0"],), (d_sym,))[1]


def _tda_matvec(fr):
    import jax.numpy as jnp

    def matvec(x):
        xs = _split(fr, x)
        d = jnp.stack([fr["co"][s] @ xs[s] @ fr["cv"][s].T
                       for s in range(2)])
        j, k = fr["jk_fn"](d)
        v = j[None] - fr["hyb"] * k
        if fr["xc_fn"] is not None:
            v = v + _kernel_jvp(fr, 0.5 * (d + jnp.swapaxes(d, -1, -2)))
        return _project(fr, v, xs)

    return matvec


def run_tddft_rpa(scf_sol, nroots: int | None = None) -> RPAResult:
    """Full (non-TDA) RPA-TDDFT spectrum with the autodiff f_xc kernel.

    Solves [[A, B], [-B, -A]] with the Casida couplings for the
    solution's own functional, via the same Hermitian reduction as
    :func:`nbed_tpu.solvers.run_rpa`. The (A+B)/(A−B) actions are built
    from the symmetrized / antisymmetrized AO transition densities:

        (A+B)X: J(ds) + f_xc·ds − hyb K(ds),   ds = d + dᵀ
        (A−B)X: −hyb K(da),                    da = d − dᵀ

    (J and the kernel vanish on the antisymmetric part exactly), so one
    vmapped XLA program per matrix. On an ``xc=None`` engine this equals
    :func:`run_rpa` on the builder integrals — the cross-module identity
    the tests pin. KS polarizabilities come via
    :func:`nbed_tpu.solvers.polarizability` on the returned result.
    """
    import jax
    import jax.numpy as jnp

    fr = _response_frame(scf_sol)
    npairs = sum(fr["sizes"])

    def apb_matvec(x):
        xs = _split(fr, x)
        d = jnp.stack([fr["co"][s] @ xs[s] @ fr["cv"][s].T
                       for s in range(2)])
        ds = d + jnp.swapaxes(d, -1, -2)
        j, k = fr["jk_fn"](ds)
        v = j[None] - fr["hyb"] * k
        if fr["xc_fn"] is not None:
            v = v + _kernel_jvp(fr, ds)
        return _project(fr, v, xs)

    def amb_matvec(x):
        xs = _split(fr, x)
        d = jnp.stack([fr["co"][s] @ xs[s] @ fr["cv"][s].T
                       for s in range(2)])
        da = d - jnp.swapaxes(d, -1, -2)
        _, k = fr["jk_fn"](da)  # J(da) = 0 and f_xc(sym(da)) = 0 exactly
        return _project(fr, -fr["hyb"] * k, xs)

    eye = jnp.eye(npairs, dtype=fr["dm0"].dtype)
    apb = np.asarray(jax.jit(jax.vmap(apb_matvec))(eye))
    amb = np.asarray(jax.jit(jax.vmap(amb_matvec))(eye))
    apb = 0.5 * (apb + apb.T)
    amb = 0.5 * (amb + amb.T)

    amb_vals, amb_vecs = np.linalg.eigh(amb)
    n_imag_amb = int(np.sum(amb_vals < -1e-10))
    half = (amb_vecs * np.sqrt(np.maximum(amb_vals, 0.0))) @ amb_vecs.T
    w2, z = np.linalg.eigh(half @ apb @ half)
    n_imag = int(np.sum(w2 < -1e-10)) + n_imag_amb
    omega = np.sqrt(np.maximum(w2, 0.0))

    safe = np.where(omega > 1e-12, omega, 1.0)
    xpy = (half @ z) / np.sqrt(safe)[None, :]
    xmy = (apb @ xpy) / safe[None, :]
    if nroots is not None:
        omega, xpy, xmy = omega[:nroots], xpy[:, :nroots], xmy[:, :nroots]
    return RPAResult(
        excitations=omega,
        amplitudes=np.ascontiguousarray(xpy.T),
        pairs=fr["pairs"],
        e_ref_elec=fr["e_ref_elec"],
        xmy=np.ascontiguousarray(xmy.T),
        n_imaginary=n_imag,
    )
