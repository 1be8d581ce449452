"""Occupied-orbital localizers: SPADE, Pipek-Mezey, Boys, IBO.

SPADE (reference occupied/spade.py) is an S^1/2 rotation + SVD with a
largest-gap partition rule. PM/Boys/IBO replace the reference's delegation
to ``pyscf.lo`` (reference occupied/pyscf.py:307-438) with our own Jacobi
2x2 rotation sweeps over dipole / Lowdin-population matrices; active/
environment selection then follows the reference's AO-weight-share rule
(occupied/pyscf.py:120-160). Population scheme note: we use Lowdin
populations where PySCF's PM default is meta-Lowdin; selection behaviour is
equivalent at the 0.95 threshold used.
"""

import logging
from abc import ABC, abstractmethod

import jax.numpy as jnp
import numpy as np

from ..exceptions import NbedLocalizerError
from ..integrals import dipole_integrals, overlap_cross
from .system import LocalizedSystem

logger = logging.getLogger(__name__)

__all__ = [
    "OccupiedLocalizer",
    "SPADELocalizer",
    "PMLocalizer",
    "BOYSLocalizer",
    "IBOLocalizer",
    "check_values",
]


def _stack_ragged(a, b):
    """Stack two index arrays of possibly different lengths (object array
    so per-spin ``len`` stays truthful)."""
    if len(a) == len(b):
        return np.array([a, b])
    out = np.empty(2, dtype=object)
    out[0], out[1] = np.asarray(a), np.asarray(b)
    return out


def _stack_padded(a, b):
    """Stack two (n, k_s) coefficient blocks, zero-padding the narrower
    one: zero columns contribute nothing to the derived C C^T densities."""
    k = max(a.shape[-1], b.shape[-1])

    def pad(c):
        return np.pad(c, ((0, 0), (0, k - c.shape[-1])))

    return np.array([pad(a), pad(b)])


def _s_half(s):
    w, v = np.linalg.eigh(np.asarray(s))
    return (v * np.sqrt(w)[None, :]) @ v.T


def _s_inv(s):
    w, v = np.linalg.eigh(np.asarray(s))
    return (v * (1.0 / w)[None, :]) @ v.T


class OccupiedLocalizer(ABC):
    """Spin dispatch + sense checks (reference occupied/base.py:15-159)."""

    def __init__(self, global_scf, n_active_atoms: int, n_mo_overwrite=None):
        self.n_mo_overwrite = (None, None) if n_mo_overwrite is None else n_mo_overwrite
        self._global_scf = global_scf
        self._n_active_atoms = n_active_atoms
        self.spinless = np.asarray(global_scf.mo_coeff).ndim == 2
        self.enviro_selection_condition = None

    def localize(self) -> LocalizedSystem:
        """Partition the occupied space; unrestricted inputs are re-localized
        with summed occupancies when alpha/beta counts differ (reference
        occupied/base.py:107-130)."""
        mo_coeff = np.asarray(self._global_scf.mo_coeff)
        mo_occ = np.asarray(self._global_scf.mo_occ)
        if self.spinless:
            loc = self._localize_spin(mo_coeff, mo_occ, self.n_mo_overwrite[0])
            loc.dm_active = loc.dm_active * 2.0
            loc.dm_enviro = loc.dm_enviro * 2.0
            return loc

        alpha = self._localize_spin(mo_coeff[0], mo_occ[0], self.n_mo_overwrite[0])
        beta = self._localize_spin(mo_coeff[1], mo_occ[1], self.n_mo_overwrite[1])
        if (len(alpha.active_mo_inds) != len(beta.active_mo_inds)
                or len(alpha.enviro_mo_inds) != len(beta.enviro_mo_inds)):
            # genuine open shell (odd spin): the per-spin partitions have
            # different sizes and that is the physically faithful answer —
            # keep them (ragged index arrays, zero-padded C stacks so the
            # derived density matrices stay exact). The reference's
            # summed-occupancy equalisation (occupied/base.py:107-130)
            # would count a beta *virtual* as occupied here, breaking the
            # density partition; its stacking also crashes on ragged
            # shapes, so this path is new capability, not a deviation.
            logger.info(
                "Unequal alpha/beta partitions (%d/%d active): keeping "
                "faithful per-spin spaces.",
                len(alpha.active_mo_inds), len(beta.active_mo_inds),
            )
            return LocalizedSystem(
                _stack_ragged(alpha.active_mo_inds, beta.active_mo_inds),
                _stack_ragged(alpha.enviro_mo_inds, beta.enviro_mo_inds),
                _stack_padded(alpha.c_active, beta.c_active),
                _stack_padded(alpha.c_enviro, beta.c_enviro),
                _stack_padded(alpha.c_loc_occ, beta.c_loc_occ),
            )
        loc = LocalizedSystem(
            np.array([alpha.active_mo_inds, beta.active_mo_inds]),
            np.array([alpha.enviro_mo_inds, beta.enviro_mo_inds]),
            np.array([alpha.c_active, beta.c_active]),
            np.array([alpha.c_enviro, beta.c_enviro]),
            np.array([alpha.c_loc_occ, beta.c_loc_occ]),
        )
        if set(alpha.active_mo_inds.tolist()) != set(beta.active_mo_inds.tolist()) or \
           set(alpha.enviro_mo_inds.tolist()) != set(beta.enviro_mo_inds.tolist()):
            logger.debug("Re-localizing with summed occupancies for equal spins.")
            occ_sum = np.sum(mo_occ, axis=0)
            a_c = self._localize_spin(mo_coeff[0], occ_sum, self.n_mo_overwrite[0])
            b_c = self._localize_spin(mo_coeff[1], occ_sum, self.n_mo_overwrite[1])
            loc = LocalizedSystem(
                np.array([alpha.active_mo_inds, beta.active_mo_inds]),
                np.array([alpha.enviro_mo_inds, beta.enviro_mo_inds]),
                np.array([a_c.c_active, b_c.c_active]),
                np.array([a_c.c_enviro, b_c.c_enviro]),
                np.array([a_c.c_loc_occ, b_c.c_loc_occ]),
            )
        return loc

    @abstractmethod
    def _localize_spin(self, c_matrix, occupancy, n_mo_overwrite=None) -> LocalizedSystem:
        """Localize one spin channel."""

    # shared helpers -------------------------------------------------------
    @property
    def _mol(self):
        return self._global_scf.mol

    @property
    def _n_act_aos(self):
        return int(self._mol.aoslice_by_atom()[self._n_active_atoms - 1][-1])

    @property
    def _ao_overlap(self):
        return np.asarray(self._global_scf.engine.s)


class SPADELocalizer(OccupiedLocalizer):
    """Subsystem Projected AO Decomposition (reference occupied/spade.py)."""

    def __init__(self, global_scf, n_active_atoms, max_shells: int = 4,
                 n_mo_overwrite=None):
        self.max_shells = max_shells
        self.shells = None
        self.singular_values = None
        super().__init__(global_scf, n_active_atoms, n_mo_overwrite)

    def _localize_spin(self, c_matrix, occupancy, n_mo_overwrite=None):
        n_occ = int(np.count_nonzero(occupancy))
        occupied = c_matrix[:, :n_occ]
        n_act_aos = self._n_act_aos
        rotated = _s_half(self._ao_overlap) @ occupied
        # SVD of the active-AO rows. full_matrices=True is essential: when
        # n_act_aos < n_occ the environment span lives in the orthogonal
        # complement of the right-singular space, which a thin SVD drops —
        # the thin form silently truncated c_enviro to n_act_aos - n_act_mos
        # columns on molecules larger than the active fragment (pfoa).
        _, sigma, vt = np.linalg.svd(rotated[:n_act_aos, :], full_matrices=True)

        if len(sigma) == 1:
            n_act_mos = 1
        elif n_mo_overwrite is not None and len(sigma) >= n_mo_overwrite:
            n_act_mos = int(n_mo_overwrite)
        else:
            diffs = sigma[:-1] - sigma[1:]
            if np.allclose(diffs, np.zeros_like(diffs)):
                # fully degenerate: the whole system is active
                n_act_mos = len(sigma)
            else:
                n_act_mos = int(np.argmax(diffs)) + 1

        n_env_mos = n_occ - n_act_mos
        active_mo_inds = np.arange(n_act_mos)
        enviro_mo_inds = np.arange(n_act_mos, n_act_mos + n_env_mos)
        right = vt.T
        c_active = occupied @ right[:, :n_act_mos]
        c_enviro = occupied @ right[:, n_act_mos:]
        c_loc_occ = occupied @ right

        if self.enviro_selection_condition is None:
            self.enviro_selection_condition = (sigma, np.zeros(len(sigma)))
        else:
            self.enviro_selection_condition = (
                self.enviro_selection_condition[0], sigma,
            )
        return LocalizedSystem(active_mo_inds, enviro_mo_inds, c_active,
                               c_enviro, c_loc_occ)


# --------------------------------------------------------------------------
# Jacobi-sweep localizers
# --------------------------------------------------------------------------

def _jacobi_sweeps(c_occ, pop_matrices, exponent=2, max_sweeps=200, tol=1e-10):
    """Maximize sum_i sum_A (Q^A_ii)^p by 2x2 Jacobi rotations.

    ``pop_matrices``: (A, n_ao, n_ao) symmetric operators (atomic population
    projectors for PM/IBO, dipole components for Boys). Uses the exact
    closed-form angle for p=2 and a dense angle scan + refinement for p=4.
    """
    c = np.array(c_occ)
    n = c.shape[1]
    if n < 2:
        return c
    ops = np.asarray(pop_matrices)

    def q_all(c):
        return np.einsum("pi,apq,qj->aij", c, ops, c)

    for _ in range(max_sweeps):
        improvement = 0.0
        q = q_all(c)
        for i in range(n):
            for j in range(i + 1, n):
                qii, qjj, qij = q[:, i, i], q[:, j, j], q[:, i, j]
                if exponent == 2:
                    a_term = float(np.sum(qij**2 - 0.25 * (qii - qjj) ** 2))
                    b_term = float(np.sum(qij * (qii - qjj)))
                    norm = np.hypot(a_term, b_term)
                    if norm < 1e-14 or norm + a_term < tol * 1e-2:
                        continue
                    alpha = 0.25 * np.arctan2(b_term, -a_term)
                    gain = a_term + norm
                else:
                    # p=4 (IBO): scan the pi/2-periodic angle objective
                    grid = np.linspace(-np.pi / 4, np.pi / 4, 65)
                    cg, sg = np.cos(grid), np.sin(grid)
                    qii_r = (cg**2)[None] * qii[:, None] + (sg**2)[None] * qjj[:, None] \
                        + (2 * cg * sg)[None] * qij[:, None]
                    qjj_r = (sg**2)[None] * qii[:, None] + (cg**2)[None] * qjj[:, None] \
                        - (2 * cg * sg)[None] * qij[:, None]
                    obj = np.sum(qii_r**4 + qjj_r**4, axis=0)
                    k = int(np.argmax(obj))
                    gain = obj[k] - obj[len(grid) // 2]
                    if gain < tol * 1e-2:
                        continue
                    alpha = grid[k]
                cos_a, sin_a = np.cos(alpha), np.sin(alpha)
                ci, cj = c[:, i].copy(), c[:, j].copy()
                c[:, i] = cos_a * ci + sin_a * cj
                c[:, j] = -sin_a * ci + cos_a * cj
                # incremental update q -> G^T q G: a 2x2 rotation only mixes
                # rows/columns (i, j), O(A n) instead of re-projecting the
                # full AO operators (O(A nao^2 n)) after every rotation
                qi, qj = q[:, i, :].copy(), q[:, j, :].copy()
                q[:, i, :] = cos_a * qi + sin_a * qj
                q[:, j, :] = -sin_a * qi + cos_a * qj
                qi, qj = q[:, :, i].copy(), q[:, :, j].copy()
                q[:, :, i] = cos_a * qi + sin_a * qj
                q[:, :, j] = -sin_a * qi + cos_a * qj
                improvement += max(gain, 0.0)
        if improvement < tol:
            break
    return c


class _JacobiLocalizer(OccupiedLocalizer, ABC):
    """Shared active-selection logic (reference occupied/pyscf.py:90-180)."""

    def __init__(self, global_scf, n_active_atoms, occ_cutoff=0.95,
                 virt_cutoff=0.95):
        self.occ_cutoff = self._valid_threshold(occ_cutoff)
        self.virt_cutoff = self._valid_threshold(virt_cutoff)
        super().__init__(global_scf, n_active_atoms)

    @staticmethod
    def _valid_threshold(threshold: float):
        if 0.0 <= threshold <= 1.0:
            return threshold
        raise ValueError(f"threshold: {threshold} is not in range [0,1] inclusive")

    @abstractmethod
    def _rotate(self, c_std_occ) -> np.ndarray:
        """Return the localized occupied C matrix."""

    def _localize_spin(self, c_matrix, occupancy, n_mo_overwrite=None):
        n_occ = int(np.count_nonzero(occupancy))
        c_loc_occ = self._rotate(c_matrix[:, :n_occ])

        ao_slice = self._mol.aoslice_by_atom()
        active_aos = np.arange(ao_slice[0, 2], ao_slice[self._n_active_atoms - 1, 3])
        numerator = np.einsum("ij->j", c_loc_occ[active_aos, :] ** 2)
        denominator = np.einsum("ij->j", c_loc_occ**2)
        share = numerator / denominator
        active_mo_inds = np.where(share > self.occ_cutoff)[0]

        if np.allclose(np.zeros_like(share), share - share.sum() / len(share)):
            # highly symmetric molecule: split half and half
            logger.warning("AO share equal everywhere; splitting half and half.")
            active_mo_inds = np.arange(c_loc_occ.shape[1] // 2)
        elif len(active_mo_inds) == 0:
            logger.warning("No active MOs above threshold; forcing max-share MO.")
            active_mo_inds = share.argsort()[::-1][:1]

        enviro_mo_inds = np.array(
            [i for i in range(c_loc_occ.shape[1]) if i not in active_mo_inds]
        )
        c_active = c_loc_occ[:, active_mo_inds]
        if len(enviro_mo_inds) == 0:
            logger.warning("No environment electronic density.")
            c_enviro = np.zeros((c_active.shape[0], 1))
        else:
            c_enviro = c_loc_occ[:, enviro_mo_inds]
        self.enviro_selection_condition = share
        return LocalizedSystem(active_mo_inds, enviro_mo_inds, c_active,
                               c_enviro, c_loc_occ)

    # atomic population projectors (Lowdin) -------------------------------
    def _lowdin_populations(self):
        s_half = _s_half(self._ao_overlap)
        ao_slice = self._mol.aoslice_by_atom()
        ops = []
        for ia in range(self._mol.natm):
            mask = np.zeros(self._mol.nao)
            mask[ao_slice[ia, 2]: ao_slice[ia, 3]] = 1.0
            ops.append(s_half @ np.diag(mask) @ s_half)
        return np.stack(ops)


class PMLocalizer(_JacobiLocalizer):
    """Pipek-Mezey with Lowdin populations (reference occupied/pyscf.py:307)."""

    def _rotate(self, c_std_occ):
        return _jacobi_sweeps(c_std_occ, self._lowdin_populations(), exponent=2)


class BOYSLocalizer(_JacobiLocalizer):
    """Foster-Boys localization (reference occupied/pyscf.py:370-379)."""

    def _rotate(self, c_std_occ):
        dip = np.asarray(dipole_integrals(self._mol, jnp.asarray(self._global_scf.engine.coords)))
        return _jacobi_sweeps(c_std_occ, dip, exponent=2)


class IBOLocalizer(_JacobiLocalizer):
    """Intrinsic bond orbitals (Knizia 2013; reference occupied/pyscf.py:424).

    IAOs are constructed against an STO-3G minimal reference basis using our
    cross-basis overlaps, Lowdin-orthogonalised, and the occupied space is
    localized by Jacobi sweeps maximizing the sum of IAO charges^4.
    """

    def _iaos(self, c_occ):
        from ..chem.molecule import build_molecule

        mol = self._mol
        coords = np.asarray(self._global_scf.engine.coords)
        # minimal reference molecule (same geometry, STO-3G)
        xyz_lines = [f"{mol.natm}", ""]
        for sym, xyz in zip(mol.symbols, coords * 0.52917721092):
            xyz_lines.append(f"{sym} {xyz[0]:.12f} {xyz[1]:.12f} {xyz[2]:.12f}")
        minao = build_molecule("\n".join(xyz_lines) + "\n", "sto-3g",
                               charge=mol.charge, spin=mol.spin)
        s1 = self._ao_overlap
        s2 = np.asarray(
            overlap_cross(minao, minao, jnp.asarray(minao.coords), jnp.asarray(minao.coords))
        )
        s12 = np.asarray(
            overlap_cross(mol, minao, jnp.asarray(coords), jnp.asarray(minao.coords))
        )
        p12 = _s_inv(s1) @ s12
        p21 = _s_inv(s2) @ s12.T
        ct = p12 @ (p21 @ c_occ)
        # orthonormalize ct w.r.t. s1
        m = ct.T @ s1 @ ct
        w, v = np.linalg.eigh(m)
        ct = ct @ (v * (1.0 / np.sqrt(np.maximum(w, 1e-14)))[None, :]) @ v.T
        # Knizia's IAO formula
        o_big = c_occ @ c_occ.T @ s1
        o_tilde = ct @ ct.T @ s1
        eye = np.eye(s1.shape[0])
        a = o_big @ o_tilde @ p12 + (eye - o_big) @ (eye - o_tilde) @ p12
        # symmetric (Lowdin) orthogonalization w.r.t. s1
        m = a.T @ s1 @ a
        w, v = np.linalg.eigh(m)
        a = a @ (v * (1.0 / np.sqrt(np.maximum(w, 1e-14)))[None, :]) @ v.T
        return a, minao

    def _rotate(self, c_std_occ):
        a, minao = self._iaos(c_std_occ)
        s1 = self._ao_overlap
        proj = s1 @ a  # (nao, niao)
        ao_slice = minao.aoslice_by_atom()
        ops = []
        for ia in range(minao.natm):
            cols = np.arange(ao_slice[ia, 2], ao_slice[ia, 3])
            p = proj[:, cols]
            ops.append(p @ p.T)
        return _jacobi_sweeps(c_std_occ, np.stack(ops), exponent=4)


def check_values(localized_system: LocalizedSystem, global_scf) -> None:
    """Sense checks: spin-count parity, DM partition, electron conservation
    (reference occupied/base.py:162-248). Raises NbedLocalizerError."""
    warn = False
    if localized_system.active_mo_inds.ndim == 2:
        if (localized_system.active_mo_inds[0].shape
                != localized_system.active_mo_inds[1].shape) or (
                localized_system.enviro_mo_inds[0].shape
                != localized_system.enviro_mo_inds[1].shape):
            logger.error("Number of alpha and beta orbitals do not match.")
            warn = True

    dm_full = localized_system.c_loc_occ @ localized_system.c_loc_occ.swapaxes(-1, -2)
    dm_sum = localized_system.dm_active + localized_system.dm_enviro
    if localized_system.c_loc_occ.ndim == 2:
        density_match = np.allclose(2.0 * dm_full, dm_sum)
    else:
        density_match = np.allclose(dm_full, dm_sum)
    if not density_match:
        logger.error("Density matrix partition does not sum to total.")
        warn = True

    s = np.asarray(global_scf.engine.s)
    if localized_system.dm_active.ndim == 2:
        n_act = np.trace(localized_system.dm_active @ s)
        n_env = np.trace(localized_system.dm_enviro @ s)
    else:
        n_act = sum(np.trace(localized_system.dm_active[i] @ s) for i in (0, 1))
        n_env = sum(np.trace(localized_system.dm_enviro[i] @ s) for i in (0, 1))
    if not np.isclose(n_act + n_env, global_scf.mol.nelectron):
        logger.error("Electron count not conserved by localization.")
        warn = True

    if warn:
        raise NbedLocalizerError("Localizer sense check failed.\n")
