"""Second-quantised molecular Hamiltonian construction.

``HamiltonianBuilder.build()`` returns ``(constant, h1, 0.5*h2)`` in
interleaved spin-orbital form (even = alpha, odd = beta), matching the
reference contract (ham_builder.py:218-254) and OpenFermion's
InteractionOperator convention:

    H = constant + sum_pq h1[p,q] a+_p a_q
               + sum_pqrs (0.5*h2)[p,q,r,s] a+_p a+_q a_r a_s.
"""

import logging

import jax.numpy as jnp
import numpy as np

from ..exceptions import HamiltonianBuilderError
from ..integrals import ao_to_mo_eri

logger = logging.getLogger(__name__)

__all__ = ["HamiltonianBuilder", "reduce_virtuals", "EQ_TOLERANCE"]

# OpenFermion's default coefficient truncation threshold.
EQ_TOLERANCE = 1e-8


class HamiltonianBuilder:
    """Build the active-space spin-orbital Hamiltonian from an SCF solution.

    Args:
        scf_solution: converged (possibly embedded/truncated) SCF solution.
        constant_e_shift: classical embedding energy added as the constant.
        n_frozen_core / n_frozen_virt: optional frozen-orbital reduction.
    """

    def __init__(self, scf_solution, constant_e_shift: float = 0.0,
                 n_frozen_core: int = 0, n_frozen_virt: int = 0):
        self.scf = scf_solution
        self.constant_e_shift = constant_e_shift
        self.n_frozen_core = n_frozen_core
        self.n_frozen_virt = n_frozen_virt
        self._restricted = np.asarray(scf_solution.mo_coeff).ndim == 2

    # ------------------------------------------------------------------
    def _one_body_integrals(self) -> np.ndarray:
        """(2, k, k): per-spin MO one-body integrals, embedding potential
        included via the solution's effective hcore (ham_builder.py:54-96)."""
        c = np.asarray(self.scf.mo_coeff)
        hcore = np.asarray(self.scf.get_hcore())
        if hcore.ndim == 2:
            hcore = np.stack([hcore, hcore])
        if self._restricted:
            c = np.stack([c, c])
        return np.stack([
            c[0].T @ hcore[0] @ c[0],
            c[1].T @ hcore[1] @ c[1],
        ])

    def _two_body_integrals(self) -> np.ndarray:
        """(4, k, k, k, k) physicist-notation blocks ordered
        aaaa, bbbb, aabb, bbaa (ham_builder.py:99-156).

        With a density-fitted engine the MO two-body tensor is assembled
        from the DF factor (O(k^2 naux) transforms, no O(nao^4) tensor).
        """
        c = np.asarray(self.scf.mo_coeff)
        if self._restricted:
            c = np.stack([c, c])
        if c[0].shape[1] != c[1].shape[1]:
            raise HamiltonianBuilderError(
                "Must localize the same number of alpha and beta orbitals."
            )
        ca, cb = jnp.asarray(c[0]), jnp.asarray(c[1])
        if getattr(self.scf.engine, "density_fitting", False):
            b = self.scf.engine._df_b  # (nao, nao, naux)
            b_mo = {
                "a": jnp.einsum("abP,ai,bj->ijP", b, ca, ca),
                "b": jnp.einsum("abP,ai,bj->ijP", b, cb, cb),
            }
            blocks = []
            for s1, s2 in (("a", "a"), ("b", "b"), ("a", "b"), ("b", "a")):
                chem = np.asarray(
                    jnp.einsum("ijP,klP->ijkl", b_mo[s1], b_mo[s2])
                )
                blocks.append(chem.transpose(0, 2, 3, 1))
            return np.stack(blocks)
        eri_ao = self.scf.engine.eri
        blocks = []
        for c1, c2 in (((ca, ca)), ((cb, cb)), ((ca, cb)), ((cb, ca))):
            chem = np.asarray(ao_to_mo_eri(eri_ao, c1, c1, c2, c2))
            blocks.append(chem.transpose(0, 2, 3, 1))  # chemist -> physicist
        return np.stack(blocks)

    @staticmethod
    def _spinorb_from_spatial(one_body, two_body):
        """Interleave spatial spin blocks into spin-orbital tensors.

        Vectorised strided assignment replacing the reference's O(n^4)
        Python loop (ham_builder.py:158-216). Even indices alpha, odd beta.
        """
        k = one_body[0].shape[0]
        nq = 2 * k
        h1 = np.zeros((nq, nq))
        h1[::2, ::2] = one_body[0]
        h1[1::2, 1::2] = one_body[1]

        h2 = np.zeros((nq, nq, nq, nq))
        h2[::2, ::2, ::2, ::2] = two_body[0]  # aaaa
        h2[1::2, 1::2, 1::2, 1::2] = two_body[1]  # bbbb
        h2[::2, 1::2, 1::2, ::2] = two_body[2]  # abba (physicist mixed)
        h2[1::2, ::2, ::2, 1::2] = two_body[3]  # baab

        h1[np.abs(h1) < EQ_TOLERANCE] = 0.0
        h2[np.abs(h2) < EQ_TOLERANCE] = 0.0
        return h1, h2

    def build(self):
        """Return ``(constant, h1_spinorb, 0.5 * h2_spinorb)``.

        ``n_frozen_core > 0`` folds the lowest ``n_frozen_core`` *spatial*
        orbitals (both spins) exactly into the constant and one-body terms
        via :func:`~nbed_tpu.solvers.frozen.freeze_spinorbitals` — the
        retained-sector spectrum is unchanged (tests/test_builder.py).
        The reference accepts the same parameter but never applies it
        (reference ham_builder.py:24,227); here it is a real scale lever.
        """
        if self.n_frozen_virt != 0:
            self.scf = reduce_virtuals(self.scf, self.n_frozen_virt)
        one_body = self._one_body_integrals()
        two_body = self._two_body_integrals()
        h1, h2 = self._spinorb_from_spatial(one_body, two_body)
        constant, h2_half = self.constant_e_shift, 0.5 * h2
        if self.n_frozen_core:
            from ..solvers.frozen import freeze_spinorbitals

            occ = np.asarray(self.scf.mo_occ)
            if occ.ndim == 1:
                # restricted: occ ∈ {2, 1, 0}; a SOMO (occ=1, ROHF) is
                # alpha-occupied and beta-empty — build the per-spin map
                # accordingly so the mask is a correct occupancy map (the
                # guard below still rejects freezing a window containing
                # a SOMO, since freezing is only exact for doubly-occupied
                # orbitals)
                occ = np.stack([(occ > 0.9) * 1.0, (occ > 1.9) * 1.0])
            occ_mask = np.zeros(h1.shape[0], dtype=bool)
            occ_mask[::2] = occ[0][: h1.shape[0] // 2] > 0.5
            occ_mask[1::2] = occ[1][: h1.shape[0] // 2] > 0.5
            nf = 2 * int(self.n_frozen_core)
            if nf > h1.shape[0] or not occ_mask[:nf].all():
                raise HamiltonianBuilderError(
                    f"n_frozen_core={self.n_frozen_core} must select only "
                    "occupied spatial orbitals."
                )
            constant, h1, h2_half, _ = freeze_spinorbitals(
                constant, h1, h2_half, range(nf), occ_mask
            )
        return constant, h1, h2_half


def reduce_virtuals(scf_solution, n_frozen_virt: int):
    """Drop the highest ``n_frozen_virt`` virtual orbitals
    (reference ham_builder.py:257-285)."""
    reduced = scf_solution.copy()
    if n_frozen_virt <= 0:
        return reduced
    occ = np.asarray(reduced.mo_occ)
    if n_frozen_virt >= np.count_nonzero(occ):
        raise ValueError("Atempting to reduce virtual space by more than exist.")
    c = np.asarray(reduced.mo_coeff)
    if c.ndim == 3:
        reduced.mo_coeff = c[:, :, :-n_frozen_virt]
        reduced.mo_occ = occ[:, :-n_frozen_virt]
        reduced.mo_energy = np.asarray(reduced.mo_energy)[:, :-n_frozen_virt]
    else:
        reduced.mo_coeff = c[:, :-n_frozen_virt]
        reduced.mo_occ = occ[:-n_frozen_virt]
        reduced.mo_energy = np.asarray(reduced.mo_energy)[:-n_frozen_virt]
    return reduced
