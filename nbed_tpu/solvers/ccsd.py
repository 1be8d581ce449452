"""Spin-orbital CCSD (Stanton-Gauss-Watts-Bartlett intermediates).

One implementation covers RHF/UHF/embedded references: the spin-orbital
formulation with per-spin MO integrals handles distinct alpha/beta orbitals
and spin-resolved embedded core Hamiltonians naturally (the case the
reference patches around, driver.py:1087-1097). The amplitude update is a
jitted fixed-point step with DIIS-free damping-free iteration; energies
match PySCF CCSD to the convergence tolerance.

Replaces: PySCF ``cc.CCSD`` (reference driver.py:1105-1135).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["run_ccsd"]


def _antisymmetrized(so_h2):
    """<pq||rs> from the builder's a+a+aa coefficient tensor.

    Builder convention: coeff[p,q,r,s] = 0.5 * <pq|sr>  =>
    <pq|rs> = 2 * coeff[p,q,s,r].
    """
    v = 2.0 * np.transpose(so_h2, (0, 1, 3, 2))  # <pq|rs>
    return v - v.transpose(0, 1, 3, 2)  # <pq||rs>


@partial(jax.jit, static_argnums=(5,))
def _ccsd_step(t1, t2, fock, w, denoms, slices):
    no, nv = slices
    d1, d2 = denoms
    f = fock
    o = slice(0, no)
    v = slice(no, no + nv)

    tau_t = t2 + 0.5 * (
        jnp.einsum("ia,jb->ijab", t1, t1) - jnp.einsum("ib,ja->ijab", t1, t1)
    )
    tau = t2 + (
        jnp.einsum("ia,jb->ijab", t1, t1) - jnp.einsum("ib,ja->ijab", t1, t1)
    )

    fae = f[v, v] - jnp.diag(jnp.diag(f[v, v]))
    fae = fae - 0.5 * jnp.einsum("me,ma->ae", f[o, v], t1)
    fae = fae + jnp.einsum("mf,mafe->ae", t1, w[o, v, v, v])
    fae = fae - 0.5 * jnp.einsum("mnaf,mnef->ae", tau_t, w[o, o, v, v])

    fmi = f[o, o] - jnp.diag(jnp.diag(f[o, o]))
    fmi = fmi + 0.5 * jnp.einsum("ie,me->mi", t1, f[o, v])
    fmi = fmi + jnp.einsum("ne,mnie->mi", t1, w[o, o, o, v])
    fmi = fmi + 0.5 * jnp.einsum("inef,mnef->mi", tau_t, w[o, o, v, v])

    fme = f[o, v] + jnp.einsum("nf,mnef->me", t1, w[o, o, v, v])

    wmnij = w[o, o, o, o]
    wmnij = wmnij + jnp.einsum("je,mnie->mnij", t1, w[o, o, o, v])
    wmnij = wmnij - jnp.einsum("ie,mnje->mnij", t1, w[o, o, o, v])
    wmnij = wmnij + 0.25 * jnp.einsum("ijef,mnef->mnij", tau, w[o, o, v, v])

    wabef = w[v, v, v, v]
    wabef = wabef - jnp.einsum("mb,amef->abef", t1, w[v, o, v, v])
    wabef = wabef + jnp.einsum("ma,bmef->abef", t1, w[v, o, v, v])
    wabef = wabef + 0.25 * jnp.einsum("mnab,mnef->abef", tau, w[o, o, v, v])

    wmbej = w[o, v, v, o]
    wmbej = wmbej + jnp.einsum("jf,mbef->mbej", t1, w[o, v, v, v])
    wmbej = wmbej - jnp.einsum("nb,mnej->mbej", t1, w[o, o, v, o])
    wmbej = wmbej - jnp.einsum(
        "jnfb,mnef->mbej", 0.5 * t2 + jnp.einsum("jf,nb->jnfb", t1, t1),
        w[o, o, v, v],
    )

    # T1 equations
    rhs1 = f[o, v]
    rhs1 = rhs1 + jnp.einsum("ie,ae->ia", t1, fae)
    rhs1 = rhs1 - jnp.einsum("ma,mi->ia", t1, fmi)
    rhs1 = rhs1 + jnp.einsum("imae,me->ia", t2, fme)
    rhs1 = rhs1 - jnp.einsum("nf,naif->ia", t1, w[o, v, o, v])
    rhs1 = rhs1 - 0.5 * jnp.einsum("imef,maef->ia", t2, w[o, v, v, v])
    rhs1 = rhs1 - 0.5 * jnp.einsum("mnae,nmei->ia", t2, w[o, o, v, o])

    # T2 equations
    rhs2 = w[o, o, v, v]
    tmp_fae = fae - 0.5 * jnp.einsum("mb,me->be", t1, fme)
    term = jnp.einsum("ijae,be->ijab", t2, tmp_fae)
    rhs2 = rhs2 + term - jnp.einsum("ijbe,ae->ijab", t2, tmp_fae)
    tmp_fmi = fmi + 0.5 * jnp.einsum("je,me->mj", t1, fme)
    term = jnp.einsum("imab,mj->ijab", t2, tmp_fmi)
    rhs2 = rhs2 - term + jnp.einsum("jmab,mi->ijab", t2, tmp_fmi)
    rhs2 = rhs2 + 0.5 * jnp.einsum("mnab,mnij->ijab", tau, wmnij)
    rhs2 = rhs2 + 0.5 * jnp.einsum("ijef,abef->ijab", tau, wabef)
    perm = jnp.einsum("imae,mbej->ijab", t2, wmbej)
    perm = perm - jnp.einsum("ie,ma,mbej->ijab", t1, t1, w[o, v, v, o])
    perm = (
        perm
        - jnp.transpose(perm, (1, 0, 2, 3))
        - jnp.transpose(perm, (0, 1, 3, 2))
        + jnp.transpose(perm, (1, 0, 3, 2))
    )
    rhs2 = rhs2 + perm
    tmp = jnp.einsum("ie,abej->ijab", t1, w[v, v, v, o])
    rhs2 = rhs2 + tmp - jnp.transpose(tmp, (1, 0, 2, 3))
    tmp = jnp.einsum("ma,mbij->ijab", t1, w[o, v, o, o])
    rhs2 = rhs2 - tmp + jnp.transpose(tmp, (0, 1, 3, 2))

    t1_new = rhs1 / d1
    t2_new = rhs2 / d2

    e_corr = (
        jnp.einsum("ia,ia->", f[o, v], t1_new)
        + 0.25 * jnp.einsum("ijab,ijab->", w[o, o, v, v], t2_new)
        + 0.5 * jnp.einsum("ijab,ia,jb->", w[o, o, v, v], t1_new, t1_new)
    )
    return t1_new, t2_new, e_corr


def run_ccsd(so_h1, so_h2, occ_mask, conv_tol: float = 1e-8,
             max_cycle: int = 100):
    """CCSD correlation energy from spin-orbital integrals.

    Args:
        so_h1: (M, M) spin-orbital one-body integrals (incl. any embedding
            potential).
        so_h2: (M, M, M, M) a+a+aa coefficient tensor (builder's 0.5*h2).
        occ_mask: boolean (M,) — True for occupied spin orbitals.

    Returns:
        (e_corr, e_hf_elec): correlation energy and the reference
        (mean-field) electronic energy implied by the integrals.
    """
    occ = np.where(occ_mask)[0]
    vir = np.where(~np.asarray(occ_mask))[0]
    order = np.concatenate([occ, vir])
    h1 = np.asarray(so_h1)[np.ix_(order, order)]
    w = _antisymmetrized(np.asarray(so_h2))[np.ix_(order, order, order, order)]
    no, nv = len(occ), len(vir)

    o = slice(0, no)
    fock = h1 + np.einsum("piqi->pq", w[:, o, :, o])
    e_ref = np.einsum("ii->", h1[o, o]) + 0.5 * np.einsum("ijij->", w[o, o, o, o])

    eps = np.diag(fock)
    d1 = eps[o, None] - eps[None, no:]
    d2 = (
        eps[o, None, None, None] + eps[None, o, None, None]
        - eps[None, None, no:, None] - eps[None, None, None, no:]
    )
    t1 = fock[o, no:] / d1
    t2 = w[o, o, no:, no:] / d2

    fock_j = jnp.asarray(fock)
    w_j = jnp.asarray(w)
    t1 = jnp.asarray(t1)
    t2 = jnp.asarray(t2)
    e_prev = 0.0
    e_corr = 0.0
    # host-side Pulay DIIS on the amplitude vector (residual = update step)
    diis_dim = 6
    hist_t, hist_r = [], []
    for it in range(max_cycle):
        t1_new, t2_new, e_corr = _ccsd_step(
            t1, t2, fock_j, w_j, (jnp.asarray(d1), jnp.asarray(d2)), (no, nv)
        )
        r = np.concatenate([
            np.asarray(t1_new - t1).ravel(), np.asarray(t2_new - t2).ravel()
        ])
        t_vec = np.concatenate([
            np.asarray(t1_new).ravel(), np.asarray(t2_new).ravel()
        ])
        hist_t.append(t_vec)
        hist_r.append(r)
        if len(hist_t) > diis_dim:
            hist_t.pop(0)
            hist_r.pop(0)
        if len(hist_t) >= 2:
            m = len(hist_r)
            b = np.empty((m + 1, m + 1))
            b[:m, :m] = np.array(
                [[ri @ rj for rj in hist_r] for ri in hist_r]
            )
            b[m, :m] = b[:m, m] = 1.0
            b[m, m] = 0.0
            rhs = np.zeros(m + 1)
            rhs[m] = 1.0
            try:
                coef = np.linalg.solve(b, rhs)[:m]
                t_vec = sum(c * t for c, t in zip(coef, hist_t))
            except np.linalg.LinAlgError:
                pass
        n1 = no * nv
        t1 = jnp.asarray(t_vec[:n1].reshape(no, nv))
        t2 = jnp.asarray(t_vec[n1:].reshape(no, no, nv, nv))
        e_corr = float(e_corr)
        if abs(e_corr - e_prev) < conv_tol and float(np.abs(r).max()) < 1e-6:
            logger.debug("CCSD converged in %d cycles.", it + 1)
            return e_corr, float(e_ref)
        e_prev = e_corr
    logger.warning("CCSD did NOT converge in %d cycles.", max_cycle)
    return e_corr, float(e_ref)
