"""Spin-orbital MP2 (beyond the reference's CCSD/FCI solver menu).

E(2) = 1/4 sum_{ijab} |<ij||ab>|^2 / (e_i + e_j - e_a - e_b) — one
MXU-shaped contraction over the same antisymmetrized spin-orbital
integrals the CCSD solver consumes, and exactly the CCSD initial-guess
doubles energy. Useful as a cheap correlation screen before paying for
CCSD(T) on an embedded space.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .ccsd import _antisymmetrized

__all__ = ["run_mp2"]


@jax.jit
def _mp2_energy(w_oovv, d2):
    t2 = w_oovv / d2
    return 0.25 * jnp.sum(w_oovv * t2)


def run_mp2(so_h1, so_h2, occ_mask):
    """MP2 correlation energy from spin-orbital integrals.

    Args mirror :func:`nbed_tpu.solvers.run_ccsd`; returns
    (e_corr_mp2, e_hf_elec).
    """
    occ = np.where(occ_mask)[0]
    vir = np.where(~np.asarray(occ_mask))[0]
    order = np.concatenate([occ, vir])
    h1 = np.asarray(so_h1)[np.ix_(order, order)]
    w = _antisymmetrized(np.asarray(so_h2))[np.ix_(order, order, order, order)]
    no = len(occ)

    o = slice(0, no)
    fock = h1 + np.einsum("piqi->pq", w[:, o, :, o])
    e_ref = np.einsum("ii->", h1[o, o]) + 0.5 * np.einsum("ijij->", w[o, o, o, o])

    eps = np.diag(fock)
    d2 = (
        eps[o, None, None, None] + eps[None, o, None, None]
        - eps[None, None, no:, None] - eps[None, None, None, no:]
    )
    e2 = _mp2_energy(jnp.asarray(w[o, o, no:, no:]), jnp.asarray(d2))
    return float(e2), float(e_ref)
