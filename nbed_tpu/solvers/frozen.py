"""Frozen-orbital reduction of spin-orbital Hamiltonians.

Implements the standard frozen-core/frozen-virtual transformation: frozen
occupied spin orbitals contribute their mean-field energy and fold their
Coulomb/exchange field into the one-body integrals of the remaining space;
frozen virtuals are simply dropped. This serves the reference's
``frozen=[...]`` paths of embedded FCI/CCSD (reference driver.py:1070-1082,
which routes through CASSCF, and cc.CCSD(frozen=...), driver.py:1127).
"""

import numpy as np

__all__ = ["freeze_spinorbitals"]


def freeze_spinorbitals(constant, h1, h2, frozen, occ_mask):
    """Fold frozen spin orbitals into (constant, h1, h2).

    Args:
        constant, h1, h2: interaction-operator tensors (h2 = coefficient of
            a+a+aa, i.e. the builder's 0.5-scaled tensor).
        frozen: iterable of spin-orbital indices to freeze. Frozen occupied
            orbitals (per ``occ_mask``) are folded into the constant and
            one-body terms; frozen virtuals are dropped.
        occ_mask: boolean (M,) occupied mask.

    Returns:
        (constant', h1', h2', occ_mask') over the reduced space.
    """
    h1 = np.asarray(h1)
    h2 = np.asarray(h2)
    occ_mask = np.asarray(occ_mask, dtype=bool)
    m = h1.shape[0]
    frozen = sorted(set(int(i) for i in frozen))
    active = np.array([i for i in range(m) if i not in frozen])
    frozen_occ = np.array([i for i in frozen if occ_mask[i]], dtype=int)

    # antisymmetrised physicist integrals <pq||rs> from the a+a+aa tensor:
    # h2[p,q,r,s] = 0.5 <pq|sr>  =>  <pq|rs> = 2 h2[p,q,s,r]
    v = 2.0 * np.transpose(h2, (0, 1, 3, 2))
    w = v - np.transpose(v, (0, 1, 3, 2))

    const = float(constant)
    if len(frozen_occ):
        const += float(np.einsum("ii->", h1[np.ix_(frozen_occ, frozen_occ)]))
        const += 0.5 * float(np.einsum(
            "ijij->", w[np.ix_(frozen_occ, frozen_occ, frozen_occ, frozen_occ)]
        ))
        h1 = h1 + np.einsum("piqi->pq", w[:, frozen_occ][:, :, :, frozen_occ])

    h1_red = h1[np.ix_(active, active)]
    h2_red = h2[np.ix_(active, active, active, active)]
    occ_red = occ_mask[active]
    return const, h1_red, h2_red, occ_red
