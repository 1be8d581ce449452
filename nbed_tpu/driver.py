"""Projection-based embedding driver.

Orchestrates: global KS/HF -> occupied localization -> subsystem-DFT energy
decomposition -> embedding potential -> mu-shift and/or Huzinaga embedded
SCF -> environment-orbital deletion -> virtual localization -> CCSD/FCI/
DFT-in-DFT references -> second-quantised Hamiltonian.

Functional re-design of the reference ``NbedDriver`` (reference
nbed/driver.py:38-1231): identical pipeline semantics and result-dict keys,
but embedding potentials are explicit SCF arguments instead of
``get_hcore`` monkey-patches, and every compute stage is a jitted JAX
kernel behind :class:`nbed_tpu.scf.engine.SCFEngine`. Like the reference
(driver.py:69-78), the driver always runs unrestricted.

Intentionally not replicated from the reference: the ``embed()`` savefile
walrus bug (driver.py:918-921) — we actually write the file.
"""

import logging
from functools import cached_property

import numpy as np

from .config import (
    NbedConfig,
    OccupiedLocalizerTypes,
    ProjectorTypes,
    VirtualLocalizerTypes,
)
from .chem import build_molecule
from .exceptions import NbedDriverError
from .ham.builder import HamiltonianBuilder
from .localizers import (
    BOYSLocalizer,
    ConcentricLocalizer,
    IBOLocalizer,
    LocalizedSystem,
    PAOLocalizer,
    PMLocalizer,
    SPADELocalizer,
)
from .scf.engine import SCFEngine, SCFSolution
from .solvers import run_ccsd, run_fci

logger = logging.getLogger(__name__)

__all__ = ["NbedDriver", "run_emb_fci", "run_emb_ccsd", "run_emb_cis",
           "run_emb_rpa", "dft_in_dft"]


class NbedDriver:
    """Run projection-based embedding from a validated config.

    Attributes populated by :meth:`embed` (same names as the reference):
    ``localized_system``, ``e_act``, ``e_env``, ``two_e_cross``, ``e_nuc``,
    ``embedding_potential``, ``mu`` / ``huzinaga`` result dicts,
    ``embedded_scf``, ``classical_energy``.
    """

    def __init__(self, config: NbedConfig):
        self.config = config
        self.mu: dict | None = None
        self.huzinaga: dict | None = None
        self.active_geometry = f"{config.n_active_atoms}\n\n" + "\n".join(
            config.geometry.splitlines()[2: 2 + config.n_active_atoms]
        )
        self.run_qmmm = None not in [
            config.mm_charges, config.mm_coords, config.mm_radii,
        ]

    # ------------------------------------------------------------ builders
    @cached_property
    def _mol(self):
        cfg = self.config
        return build_molecule(
            cfg.geometry,
            cfg.basis,
            charge=cfg.charge,
            spin=cfg.spin,
            unit=cfg.unit,
            mm_coords=cfg.mm_coords if self.run_qmmm else None,
            mm_charges=cfg.mm_charges if self.run_qmmm else None,
            mm_radii=cfg.mm_radii if self.run_qmmm else None,
        )

    # exact O(nao^4) ERIs above this AO count would dominate memory; the
    # driver then defaults to density fitting (config.density_fitting=None)
    _DF_NAO_THRESHOLD = 96

    @property
    def _use_df(self) -> bool:
        if self.config.density_fitting is not None:
            return self.config.density_fitting
        auto = self._mol.nao >= self._DF_NAO_THRESHOLD
        if auto:
            logger.info(
                "nao=%d >= %d: enabling density fitting (override with "
                "density_fitting=False).", self._mol.nao, self._DF_NAO_THRESHOLD,
            )
        return auto

    @cached_property
    def _hf_engine(self) -> SCFEngine:
        return SCFEngine(
            self._mol, xc=None,
            conv_tol=self.config.convergence,
            max_cycle=self.config.max_hf_cycles,
            density_fitting=self._use_df,
            warmup_f32=self.config.warmup_f32,
            max_memory_mb=float(self.config.max_ram_memory),
        )

    @cached_property
    def _ks_engine(self) -> SCFEngine:
        from .dft.functionals import pt2_coefficient

        if pt2_coefficient(self.config.xc_functional):
            logger.warning(
                "xc_functional=%s is a double hybrid: the embedding driver "
                "uses only its SCF (hybrid-GGA) part for subsystem-DFT and "
                "the embedding potential; the PT2 term is a post-SCF total-"
                "energy correction (solvers.run_double_hybrid), not part of "
                "v_emb.", self.config.xc_functional,
            )
        return SCFEngine(
            self._mol, xc=self.config.xc_functional,
            conv_tol=self.config.convergence,
            max_cycle=self.config.max_dft_cycles,
            density_fitting=self._use_df,
            warmup_f32=self.config.warmup_f32,
            max_memory_mb=float(self.config.max_ram_memory),
        )

    @cached_property
    def _global_hf(self) -> SCFSolution:
        sol = self._hf_engine.kernel()
        logger.info("Global HF: %s", sol.e_tot)
        return sol

    @cached_property
    def _global_ks(self) -> SCFSolution:
        sol = self._ks_engine.kernel()
        logger.info("Global UKS: %s", sol.e_tot)
        if not sol.converged:
            logger.warning("(cheap) global DFT calculation has NOT converged!")
        return sol

    @cached_property
    def _global_ccsd(self):
        """(e_tot, e_corr) of full-system CCSD on the global HF reference."""
        hb = HamiltonianBuilder(self._global_hf, 0.0)
        _, h1, h2 = hb.build()
        occ_mask = self._interleaved_occ(self._global_hf)
        e_corr, e_ref = run_ccsd(h1, h2, occ_mask, conv_tol=self.config.convergence)
        e_tot = self._global_hf.e_tot + e_corr
        logger.info("Global CCSD: %s", e_tot)
        return e_tot, e_corr

    @cached_property
    def _global_fci(self):
        """Full-system FCI total energy (exact diagonalisation)."""
        hb = HamiltonianBuilder(self._global_hf, 0.0)
        _, h1, h2 = hb.build()
        na, nb = self._global_hf.nelec
        vals, _ = run_fci(0.0, h1, h2, 2 * h1.shape[0] // 2, (na, nb))
        e_tot = float(vals[0]) + self._hf_engine.energy_nuc()
        logger.info("Global FCI: %s", e_tot)
        return e_tot

    @staticmethod
    def _interleaved_occ(sol: SCFSolution) -> np.ndarray:
        occ = np.asarray(sol.mo_occ)
        k = occ.shape[-1]
        mask = np.zeros(2 * k, dtype=bool)
        mask[::2] = occ[0] > 0
        mask[1::2] = occ[1] > 0
        return mask

    # ---------------------------------------------------------- localizers
    def _localize(self) -> LocalizedSystem:
        cfg = self.config
        match cfg.localization:
            case OccupiedLocalizerTypes.SPADE:
                localizer = SPADELocalizer(
                    self._global_ks, cfg.n_active_atoms,
                    max_shells=cfg.max_shells,
                    n_mo_overwrite=self.n_mo_overwrite,
                )
            case OccupiedLocalizerTypes.BOYS:
                localizer = BOYSLocalizer(
                    self._global_ks, cfg.n_active_atoms,
                    occ_cutoff=cfg.occupied_threshold,
                    virt_cutoff=cfg.virtual_threshold,
                )
            case OccupiedLocalizerTypes.IBO:
                localizer = IBOLocalizer(
                    self._global_ks, cfg.n_active_atoms,
                    occ_cutoff=cfg.occupied_threshold,
                    virt_cutoff=cfg.virtual_threshold,
                )
            case OccupiedLocalizerTypes.PM:
                localizer = PMLocalizer(
                    self._global_ks, cfg.n_active_atoms,
                    occ_cutoff=cfg.occupied_threshold,
                    virt_cutoff=cfg.virtual_threshold,
                )
        self.localizer = localizer
        return localizer.localize()

    @cached_property
    def _env_projector(self) -> np.ndarray:
        """S D_env S per spin (reference driver.py:433-449)."""
        s = np.asarray(self._ks_engine.s)
        dm_env = self.localized_system.dm_enviro
        if dm_env.ndim == 2:
            return s @ dm_env @ s
        return np.array([s @ dm_env[0] @ s, s @ dm_env[1] @ s])

    # -------------------------------------------------------- subsystem DFT
    def _subsystem_dft(self, localized_system) -> tuple:
        """Energy decomposition e_act / e_env / two-electron cross term
        (reference driver.py:315-431)."""
        engine = self._ks_engine
        hcore = np.asarray(engine.hcore)

        def components(dm):
            veff = engine.get_veff(dm)
            dm_tot = dm[0] + dm[1] if dm.ndim == 3 else dm
            e = (
                np.einsum("ij,ji->", hcore, dm_tot)
                + float(veff.ecoul) + float(veff.exc)
            )
            j = np.asarray(engine.get_j(dm))
            return e, veff, j

        dm_act = localized_system.dm_active
        dm_env = localized_system.dm_enviro
        e_act, veff_act, j_act = components(dm_act)
        e_env, veff_env, j_env = components(dm_env)

        # keep the total density SPIN-RESOLVED: spin-summing it here would
        # evaluate XC at the spin-averaged density, which is wrong for
        # open-shell systems (alpha != beta)
        veff_total = engine.get_veff(dm_act + dm_env)
        e_xc_total = float(veff_total.exc)

        if dm_act.ndim == 2:
            j_cross = 0.5 * (
                np.einsum("ij,ij", dm_act, j_env) + np.einsum("ij,ij", dm_env, j_act)
            )
        else:
            # J is built from the spin-summed density: same for both spins
            j_cross = 0.5 * (
                np.einsum("ij,ij", dm_act[0] + dm_act[1], j_env)
                + np.einsum("ij,ij", dm_env[0] + dm_env[1], j_act)
            )
        xc_cross = e_xc_total - float(veff_act.exc) - float(veff_env.exc)
        two_e_cross = j_cross + xc_cross
        return e_act, e_env, two_e_cross

    # ------------------------------------------------------------ embedding
    def _active_nelec(self) -> tuple:
        inds = self.localized_system.active_mo_inds
        if inds.dtype == object:  # ragged per-spin counts (open shell)
            return (len(inds[0]), len(inds[1]))
        if inds.ndim == 1:
            return (len(inds), len(inds))
        return (len(inds[0]), len(inds[1]))

    def _mu_embed(self, engine: SCFEngine, embedding_potential) -> tuple:
        """mu-shift embedding (reference driver.py:500-538).

        The embedded SCF is seeded from the localized active density — the
        analogue of the reference's PySCF default ('minao'-family) guess;
        the bare hcore+v_emb guess diverges at ~100+ AOs under the
        mu-shifted projector.
        """
        v_emb = self.config.mu_level_shift * self._env_projector + embedding_potential
        sol = engine.kernel(
            nelec=self._active_nelec(), v_emb=v_emb,
            dm0=self.localized_system.dm_active,
        )
        if not sol.converged:
            # one retry with a virtual level shift (the reference only
            # warns and continues, driver.py:188-189; the shift damps
            # occupied<->virtual oscillation without moving the fixed point)
            logger.warning(
                "mu-embedded SCF did not converge; retrying with a 0.25 Ha "
                "virtual level shift."
            )
            sol = engine.kernel(
                nelec=self._active_nelec(), v_emb=v_emb,
                dm0=self.localized_system.dm_active, level_shift=0.25,
            )
        logger.info(
            "Embedded scf energy MU_SHIFT: %s, converged: %s",
            sol.e_tot, sol.converged,
        )
        return sol, v_emb

    def _huzinaga_embed(self, engine: SCFEngine, embedding_potential,
                        localized_system, dmat_initial_guess=None) -> tuple:
        """Huzinaga-projector embedding (reference driver.py:540-632)."""
        if localized_system.c_loc_virt is not None:
            cv = localized_system.c_loc_virt
            virt_proj = cv @ cv.swapaxes(-1, -2)
            eye = np.eye(cv.shape[-2])
            dm_env_virt = eye[None] - localized_system.dm_loc_occ - virt_proj
        else:
            dm_env_virt = None

        if dmat_initial_guess is None:
            # seed from the localized active density (the reference's
            # huzinaga loop would build a diag(heff) guess, which diverges
            # at ~100+ AOs; the fixed point is unchanged)
            dmat_initial_guess = localized_system.dm_active
        sol = engine.kernel(
            nelec=self._active_nelec(),
            v_emb=embedding_potential,
            dm_env_occ=localized_system.dm_enviro,
            dm_env_virt=dm_env_virt,
            dm0=dmat_initial_guess,
        )
        if not sol.converged:
            logger.warning(
                "Huzinaga embedded SCF did not converge; retrying with a "
                "0.25 Ha virtual level shift."
            )
            sol = engine.kernel(
                nelec=self._active_nelec(),
                v_emb=embedding_potential,
                dm_env_occ=localized_system.dm_enviro,
                dm_env_virt=dm_env_virt,
                dm0=dmat_initial_guess,
                level_shift=0.25,
            )
        # Freeze the converged Huzinaga operator into the effective core
        # Hamiltonian, as the reference writes back to the PySCF object
        # (driver.py:595-597).
        v_emb = sol.huzinaga_op + np.asarray(embedding_potential)
        sol.v_emb = v_emb
        sol.huzinaga_op = None
        logger.info("Embedded scf energy HUZINAGA: %s", sol.e_tot)
        return sol, v_emb

    def _delete_environment(self, projector, sol: SCFSolution,
                            localized_system, env_projector) -> SCFSolution:
        """Remove environment MOs from the embedded solution
        (reference driver.py:634-791)."""
        c_env = localized_system.c_enviro
        if c_env.ndim == 2:
            n_env_mos = c_env.shape[-1]
            sol.mo_coeff, sol.mo_energy, sol.mo_occ = _delete_spin_environment(
                projector, n_env_mos, sol.mo_coeff, sol.mo_energy, sol.mo_occ,
                env_projector,
            )
        else:
            inds = localized_system.enviro_mo_inds
            if inds.dtype == object:
                # open shell: per-spin environment sizes differ
                n_env = (len(inds[0]), len(inds[1]))
            else:
                # Per-spin counts. The reference takes the union of the two
                # spin index sets (reference driver.py:671-676), which is
                # identical to the per-spin count in every case the
                # reference can reach: its occupied localizer re-localizes
                # with summed occupancies to force equal alpha/beta
                # partitions (reference occupied/base.py:107-130), so the
                # sets coincide. With faithfully unequal spin partitions
                # (spin>=2: equal env COUNTS but different env INDICES,
                # e.g. triplet CH2 SPADE: alpha env {3,4}, beta env {1,2})
                # the union over-counts and deletes legitimate virtuals —
                # differently for mu (drops from the top) and huzinaga
                # (drops by env overlap), driving the projectors ~1 Ha
                # apart on the embedded FCI.
                n_env = (inds.shape[-1], inds.shape[-1])
            parts = [
                _delete_spin_environment(
                    projector, n_env[s], sol.mo_coeff[s], sol.mo_energy[s],
                    sol.mo_occ[s], env_projector[s],
                    n_extra_virt=max(n_env) - n_env[s],
                )
                for s in (0, 1)
            ]
            sol.mo_coeff = np.array([parts[0][0], parts[1][0]])
            sol.mo_energy = np.array([parts[0][1], parts[1][1]])
            sol.mo_occ = np.array([parts[0][2], parts[1][2]])
        return sol

    # ---------------------------------------------------------------- main
    def embed(self, init_huzinaga_rhf_with_mu: bool = False,
              n_mo_overwrite: tuple = (None, None)) -> None:
        """Run the full embedding pipeline (reference driver.py:808-923)."""
        cfg = self.config
        if (cfg.virtual_localization is VirtualLocalizerTypes.PROJECTED_AO
                and cfg.projector is not ProjectorTypes.HUZ):
            # PAO virtuals define the Huzinaga virtual-space projector, so
            # they require the Huzinaga embedding. The reference guards *all*
            # projectors (driver.py:819-820), leaving its own PAO+huz branch
            # (driver.py:878-888) dead; here PAO+huzinaga runs end-to-end.
            raise NotImplementedError(
                "PAO virtual localization requires projector='huzinaga'."
            )

        init_huzinaga_rhf_with_mu = (
            init_huzinaga_rhf_with_mu or cfg.init_huzinaga_rhf_with_mu
        )
        from .profiling import StageTimer

        timer = StageTimer()
        self.timings = timer.timings

        self.e_nuc = self._ks_engine.energy_nuc()

        if n_mo_overwrite is not None and n_mo_overwrite != (None, None):
            self.n_mo_overwrite = n_mo_overwrite
        else:
            self.n_mo_overwrite = cfg.n_mo_overwrite

        with timer("global_ks"):
            self._global_ks  # noqa: B018 — materialise the cached SCF
        with timer("localize"):
            self.localized_system = self._localize()
        logger.info("Active MO indices: %s", self.localized_system.active_mo_inds)
        logger.info("Environment MO indices: %s", self.localized_system.enviro_mo_inds)

        with timer("subsystem_dft"):
            # one fused program: energy decomposition + embedding potential
            # (reference runs five separate veff/J builds,
            # driver.py:344-345,391,845-851)
            (self.e_act, self.e_env, self.two_e_cross,
             self.embedding_potential) = self._ks_engine.subsystem_decomposition(
                self.localized_system.dm_active,
                self.localized_system.dm_enviro,
            )

        if cfg.projector in (ProjectorTypes.MU, ProjectorTypes.BOTH) or \
                init_huzinaga_rhf_with_mu:
            with timer("mu_embed"):
                embedded_scf, v_emb = self._mu_embed(
                    self._hf_engine, self.embedding_potential
                )
            with timer("mu_post_embed"):
                self.mu = self.post_embed(embedded_scf, v_emb, ProjectorTypes.MU)

        if cfg.projector in (ProjectorTypes.HUZ, ProjectorTypes.BOTH):
            dm0 = (
                self.mu["scf"].make_rdm1() if init_huzinaga_rhf_with_mu else None
            )
            if cfg.virtual_localization == VirtualLocalizerTypes.PROJECTED_AO:
                # PAO virtuals feed the Huzinaga virtual-space projector
                # (reference driver.py:878-888; unreachable behind the same
                # top-of-embed guard the reference has, driver.py:819-820)
                pao = PAOLocalizer(
                    self._global_hf, cfg.n_active_atoms,
                    self.localized_system.c_loc_occ,
                    norm_cutoff=cfg.norm_cutoff,
                    overlap_cutoff=cfg.overlap_cutoff,
                )
                self.localized_system.c_loc_virt = pao.localize_virtual()
            with timer("huzinaga_embed"):
                embedded_scf, v_emb = self._huzinaga_embed(
                    self._hf_engine, self.embedding_potential,
                    self.localized_system, dm0,
                )
            with timer("huzinaga_post_embed"):
                self.huzinaga = self.post_embed(
                    embedded_scf, v_emb, ProjectorTypes.HUZ
                )

        match cfg.projector:
            case ProjectorTypes.MU:
                self.embedded_scf = self.mu["scf"]
                self.classical_energy = self.mu["classical_energy"]
            case ProjectorTypes.HUZ:
                self.embedded_scf = self.huzinaga["scf"]
                self.classical_energy = self.huzinaga["classical_energy"]
            case ProjectorTypes.BOTH:
                self.embedded_scf = (self.mu["scf"], self.huzinaga["scf"])
                self.classical_energy = (
                    self.mu["classical_energy"],
                    self.huzinaga["classical_energy"],
                )
            case _:
                logger.warning("Not assigning embedded_scf or classical_energy")

        if self.config.savefile is not None:
            self._save(self.config.savefile)
        logger.info("Embedding complete.")

    def post_embed(self, embedded_scf: SCFSolution, v_emb, projector) -> dict:
        """Projector-dependent result assembly (reference driver.py:925-1041)."""
        cfg = self.config
        result = {}
        result["scf"] = embedded_scf.copy()
        result["v_emb"] = np.asarray(v_emb)
        result["mo_energies_emb_pre_del"] = np.asarray(result["scf"].mo_energy)
        result["scf"] = self._delete_environment(
            projector, result["scf"], self.localized_system, self._env_projector
        )
        result["mo_energies_emb_post_del"] = np.asarray(result["scf"].mo_energy)

        dm_act = self.localized_system.dm_active
        if dm_act.ndim == 2:
            result["correction"] = np.einsum("ij,ij", result["v_emb"], dm_act)
            result["beta_correction"] = 0.0
        else:
            result["correction"] = np.einsum("ij,ij", result["v_emb"][0], dm_act[0])
            result["beta_correction"] = np.einsum(
                "ij,ij", result["v_emb"][1], dm_act[1]
            )

        match cfg.virtual_localization:
            case VirtualLocalizerTypes.CONCENTRIC:
                result["cl"] = ConcentricLocalizer(
                    result["scf"], cfg.n_active_atoms, max_shells=cfg.max_shells,
                )
                result["scf"] = result["cl"].localize_virtual()
            case VirtualLocalizerTypes.DISABLE:
                logger.debug("Not performing virtual localization.")
            case _:
                logger.debug("No method for %s", cfg.virtual_localization)

        corr = result["correction"] + result["beta_correction"]
        result["e_rhf"] = (
            result["scf"].e_tot + self.e_env + self.two_e_cross - corr
        )
        result["classical_energy"] = (
            self.e_env + self.two_e_cross + self.e_nuc - corr
        )

        if cfg.run_ccsd_emb:
            e_ccsd_tot, e_ccsd_corr = run_emb_ccsd(
                result["scf"], convergence=cfg.convergence
            )
            result["e_ccsd"] = (
                e_ccsd_tot + self.e_env + self.two_e_cross - corr
            )
            result["ccsd_emb"] = e_ccsd_tot - self.e_nuc
            logger.info("CCSD Energy %s: %s", projector, result["e_ccsd"])

        if cfg.run_fci_emb:
            e_fci_tot = run_emb_fci(result["scf"], convergence=cfg.convergence)
            result["e_fci"] = e_fci_tot + self.e_env + self.two_e_cross - corr
            result["fci_emb"] = e_fci_tot - self.e_nuc
            logger.info("FCI Energy %s: %s", projector, result["e_fci"])

        result["hf_emb"] = result["scf"].e_tot - self.e_nuc

        if cfg.run_dft_in_dft:
            result.update(dft_in_dft(self, projector))

        hb = HamiltonianBuilder(result["scf"], result["classical_energy"])
        result["second_quantised"] = hb.build()

        if cfg.taper_qubits:
            from .ham.qubit import MAPPINGS
            from .ham.taper import taper_auto
            from .solvers.vqe import _encode_reference

            psum = MAPPINGS[cfg.qubit_mapping](*result["second_quantised"])
            occ = np.asarray(result["scf"].mo_occ)
            if occ.ndim == 1:
                occ = np.stack([occ, occ])
            hf_bits = 0  # builder interleave: bit 2p alpha MO p, 2p+1 beta
            for p in np.nonzero(occ[0] > 0)[0]:
                hf_bits |= 1 << (2 * int(p))
            for p in np.nonzero(occ[1] > 0)[0]:
                hf_bits |= 1 << (2 * int(p) + 1)
            # the HF determinant's computational-basis index in the chosen
            # encoding (JW = raw occupations; BK/parity = linear image)
            hf_bits = _encode_reference(hf_bits, cfg.qubit_mapping,
                                        psum.n_qubits)
            tapered, syms, sector = taper_auto(psum, hf_bits=hf_bits)
            result["tapered"] = {
                "psum": tapered,
                "symmetries": syms,
                "sector": sector,
                "n_qubits_raw": psum.n_qubits,
                "n_qubits": tapered.n_qubits,
                "n_terms_raw": len(psum),
                "n_terms": len(tapered),
            }
            logger.info(
                "Tapering %s: %d -> %d qubits (%d symmetries)",
                projector, psum.n_qubits, tapered.n_qubits, len(syms),
            )

        if cfg.run_cis_emb:
            from .solvers.cis import oscillator_strengths

            cis = run_emb_cis(result["scf"], nroots=cfg.run_cis_emb)
            f_osc, mu_tr = oscillator_strengths(result["scf"], cis)
            result["cis"] = cis
            result["cis_oscillator_strengths"] = f_osc
            result["e_cis"] = result["e_rhf"] + cis.excitations
            logger.info(
                "CIS excitations %s (Ha): %s", projector,
                np.array2string(cis.excitations, precision=6),
            )

        if cfg.run_rpa_emb:
            from .solvers.cis import oscillator_strengths

            rpa = run_emb_rpa(result["scf"])  # full spectrum (X+Y gauge)
            f_osc, mu_tr = oscillator_strengths(result["scf"], rpa)
            nroots = int(cfg.run_rpa_emb)
            result["rpa"] = rpa
            result["rpa_oscillator_strengths"] = f_osc[:nroots]
            result["e_rpa"] = result["e_rhf"] + rpa.excitations[:nroots]
            logger.info(
                "RPA excitations %s (Ha): %s", projector,
                np.array2string(rpa.excitations[:nroots], precision=6),
            )

        if cfg.run_vqe_emb:
            from .solvers import run_vqe

            occ = np.asarray(result["scf"].mo_occ)
            nelec = (int(np.sum(occ[0] > 0)), int(np.sum(occ[1] > 0)))
            try:
                vqe = run_vqe(*result["second_quantised"], nelec=nelec,
                              mapping=cfg.qubit_mapping)
                result["vqe"] = vqe
                result["e_vqe"] = vqe.e_vqe
                logger.info("VQE Energy %s: %s", projector, vqe.e_vqe)
            except ValueError as exc:  # active space too large: warn, keep going
                logger.warning("Skipping embedded VQE: %s", exc)
        return result

    # ------------------------------------------------------------- helpers
    def _run_emb_ccsd(self, scf_sol, frozen=None):
        """(ccsd_like, e_corr) — parity shim for the reference API."""
        e_tot, e_corr = run_emb_ccsd(scf_sol, frozen, self.config.convergence)
        return _EnergyResult(e_tot), e_corr

    def _run_emb_fci(self, scf_sol, frozen=None):
        return _EnergyResult(run_emb_fci(scf_sol, frozen, self.config.convergence))

    def _dft_in_dft(self, projection_method) -> dict:
        return dft_in_dft(self, projection_method)

    def _save(self, filename):
        """JSON dump of scalar results (reference intent, driver.py:918-921,
        minus its walrus bug and unserialisable arrays)."""
        import json

        def clean(d):
            if d is None:
                return None
            out = {}
            for key, val in d.items():
                if isinstance(val, (int, float, np.floating)):
                    out[key] = float(val)
            return out

        with open(filename, "w") as f:
            json.dump({"mu": clean(self.mu), "huzinaga": clean(self.huzinaga)}, f)


class _EnergyResult:
    """Tiny shim exposing ``.e_tot`` for API parity with PySCF returns."""

    def __init__(self, e_tot):
        self.e_tot = e_tot


def _delete_spin_environment(projector, n_env_mo, mo_coeff, mo_energy, mo_occ,
                             environment_projector, n_extra_virt: int = 0):
    """Drop the environment MOs of one spin channel
    (reference driver.py:713-791).

    ``n_extra_virt`` additionally truncates that many highest-energy
    *legitimate* virtuals — used to equalize per-spin column counts when a
    spin-asymmetric partition yields ragged environment sizes (the MO stack
    is rectangular).  Strictly milder than the reference's union rule
    (reference driver.py:671-676), which deletes the union count from BOTH
    spins by the env ranking and so removes legitimate virtuals *by the
    wrong criterion*.
    """
    if projector is ProjectorTypes.HUZ:
        # Rank by the TRUE overlap diag(C^T P_env C) — MO i's population in
        # the environment projector ("ij,ji->i").  The reference instead
        # computes "ij,ki->i" (reference driver.py:749-753), which
        # contracts j and k INDEPENDENTLY: (Σ_j C_ji)·(Σ_k (P C)_ki), a
        # product of coefficient sums, not an overlap — a probable
        # reference bug its surrounding comments contradict.  Both metrics
        # select the same environment set on the oracle systems (pinned by
        # tests/test_driver.py::test_huzinaga_env_ranking_metrics), so the
        # physically meaningful metric is used here.
        overlap = np.einsum(
            "ij,ji->i", mo_coeff.swapaxes(-1, -2), environment_projector @ mo_coeff
        )
        frozen = list(overlap.argsort()[::-1][:n_env_mo])
    else:  # MU: level-shifted orbitals end up highest
        shift = mo_coeff.shape[-1] - n_env_mo
        frozen = list(range(shift, mo_coeff.shape[-1]))

    if n_extra_virt:
        candidates = [
            i for i in np.argsort(mo_energy)[::-1]
            if i not in frozen and mo_occ[i] == 0
        ]
        if len(candidates) < n_extra_virt:
            raise NbedDriverError(
                "Cannot equalize spin channels: not enough virtual orbitals "
                f"to truncate ({len(candidates)} < {n_extra_virt})."
            )
        frozen.extend(int(i) for i in candidates[:n_extra_virt])

    active = [i for i in range(mo_coeff.shape[-1]) if i not in frozen]
    logger.info("Orbital indices for embedded system: %s", active)
    logger.info("Orbital indices removed: %s", frozen)
    return mo_coeff[:, active], mo_energy[active], mo_occ[active]


def _spin_expand_frozen(frozen):
    """Spatial MO indices -> interleaved spin-orbital indices."""
    out = []
    for i in frozen:
        out.extend([2 * int(i), 2 * int(i) + 1])
    return out


def run_emb_ccsd(scf_sol: SCFSolution, frozen=None, convergence: float = 1e-6,
                 triples: bool = False):
    """Embedded CCSD on the (possibly truncated) embedded SCF solution.

    Returns (e_tot, e_corr); the spin-resolved embedded core Hamiltonian is
    handled natively by the spin-orbital solver (cf. reference
    driver.py:1105-1135). ``frozen`` takes spatial MO indices; frozen
    occupied orbitals are folded in exactly (frozen core), frozen virtuals
    are dropped (reference cc.CCSD(frozen=...), driver.py:1127).
    ``triples=True`` adds the perturbative (T) correction to both returns
    (embedded CCSD(T)-in-DFT — beyond the reference).
    """
    hb = HamiltonianBuilder(scf_sol, 0.0)
    _, h1, h2 = hb.build()
    occ_mask = NbedDriver._interleaved_occ(scf_sol)
    e_shift = 0.0
    if frozen:
        from .solvers.frozen import freeze_spinorbitals

        e_shift, h1, h2, occ_mask = freeze_spinorbitals(
            0.0, h1, h2, _spin_expand_frozen(frozen), occ_mask
        )
    out = run_ccsd(h1, h2, occ_mask, conv_tol=convergence * 1e-2,
                   triples=triples)
    if triples:
        e_corr, e_t, e_ref_elec = out
        e_corr = e_corr + e_t
        logger.info("Embedded (T) correction: %s", e_t)
    else:
        e_corr, e_ref_elec = out
    e_tot = e_shift + e_ref_elec + scf_sol.energy_nuc() + e_corr
    logger.info("Embedded CCSD correlation energy: %s", e_corr)
    return e_tot, e_corr


def run_emb_fci(scf_sol: SCFSolution, frozen=None, convergence: float = 1e-6):
    """Embedded FCI (exact diagonalisation) total energy
    (reference driver.py:1044-1102; the reference's ``frozen`` path routes
    through CASSCF sort_mo — here frozen orbitals are folded into the
    integrals exactly)."""
    hb = HamiltonianBuilder(scf_sol, 0.0)
    _, h1, h2 = hb.build()
    occ = np.asarray(scf_sol.mo_occ)
    if occ.ndim == 2:
        nelec = (int(np.sum(occ[0] > 0)), int(np.sum(occ[1] > 0)))
    else:
        nelec = (int(np.sum(occ > 0)), int(np.sum(occ > 0)))
    e_shift = 0.0
    if frozen:
        from .solvers.frozen import freeze_spinorbitals

        occ_mask = NbedDriver._interleaved_occ(scf_sol)
        e_shift, h1, h2, occ_red = freeze_spinorbitals(
            0.0, h1, h2, _spin_expand_frozen(frozen), occ_mask
        )
        nelec = (int(np.sum(occ_red[::2])), int(np.sum(occ_red[1::2])))
    vals, _ = run_fci(0.0, h1, h2, h1.shape[0], nelec)
    e_tot = float(vals[0]) + e_shift + scf_sol.energy_nuc()
    logger.info("FCI embedding energy: %s", e_tot)
    return e_tot


def run_emb_cis(scf_sol: SCFSolution, nroots=None, frozen=None):
    """Embedded CIS/TDA excitation energies (beyond the reference, which
    stops at ground-state CCSD/FCI, driver.py:1044-1135): excited states
    of the active region in the environment's embedding potential.

    Returns a :class:`nbed_tpu.solvers.cis.CISResult`; excitation energies
    are relative to the embedded SCF reference, so absolute whole-system
    excited-state energies are ``result["e_rhf"] + cis.excitations``.
    """
    from .solvers.cis import run_cis

    hb = HamiltonianBuilder(scf_sol, 0.0)
    _, h1, h2 = hb.build()
    occ_mask = NbedDriver._interleaved_occ(scf_sol)
    if frozen:
        from .solvers.frozen import freeze_spinorbitals

        _, h1, h2, occ_mask = freeze_spinorbitals(
            0.0, h1, h2, _spin_expand_frozen(frozen), occ_mask
        )
    return run_cis(h1, h2, occ_mask, nroots=nroots)


def run_emb_rpa(scf_sol: SCFSolution, nroots=None, frozen=None):
    """Embedded full-RPA/TDHF excitation energies (beyond the reference):
    like :func:`run_emb_cis` but keeping the de-excitation (B) coupling —
    the full linear-response spectrum of the embedded determinant.

    Returns a :class:`nbed_tpu.solvers.cis.RPAResult`.
    """
    from .solvers.cis import run_rpa

    hb = HamiltonianBuilder(scf_sol, 0.0)
    _, h1, h2 = hb.build()
    occ_mask = NbedDriver._interleaved_occ(scf_sol)
    if frozen:
        from .solvers.frozen import freeze_spinorbitals

        _, h1, h2, occ_mask = freeze_spinorbitals(
            0.0, h1, h2, _spin_expand_frozen(frozen), occ_mask
        )
    return run_rpa(h1, h2, occ_mask, nroots=nroots)


def dft_in_dft(driver: NbedDriver, projection_method) -> dict:
    """DFT-in-DFT self-consistency check (reference driver.py:1138-1231)."""
    result = {}
    e_nuc = driver._ks_engine.energy_nuc()
    engine = driver._ks_engine
    hcore_std = np.asarray(engine.hcore)

    if projection_method is ProjectorTypes.MU:
        result["scf_dft"], result["v_emb_dft"] = driver._mu_embed(
            engine, driver.embedding_potential
        )
    else:
        result["scf_dft"], result["v_emb_dft"] = driver._huzinaga_embed(
            engine, driver.embedding_potential, driver.localized_system
        )
    result["scf_dft"] = driver._delete_environment(
        projection_method, result["scf_dft"], driver.localized_system,
        driver._env_projector,
    )

    dm_act = driver.localized_system.dm_active
    y_emb = result["scf_dft"].make_rdm1()
    if dm_act.ndim == 2:
        result["dft_correction"] = np.einsum(
            "ij,ij", result["v_emb_dft"], (y_emb - dm_act)
        )
        result["dft_correction_beta"] = 0.0
        veff = engine.get_veff(y_emb)
        rks_e_elec = (
            float(veff.exc) + float(veff.ecoul)
            + np.einsum("ij,ij", hcore_std, y_emb)
        )
    else:
        result["dft_correction"] = np.einsum(
            "ij,ij", result["v_emb_dft"][0], (y_emb[0] - dm_act[0])
        )
        result["dft_correction_beta"] = np.einsum(
            "ij,ij", result["v_emb_dft"][1], (y_emb[1] - dm_act[1])
        )
        veff = engine.get_veff(y_emb)
        rks_e_elec = (
            float(veff.exc) + float(veff.ecoul)
            + np.einsum("ij,ij", hcore_std, y_emb[0])
            + np.einsum("ij,ij", hcore_std, y_emb[1])
        )

    result["e_dft_in_dft"] = (
        rks_e_elec
        + driver.e_env
        + driver.two_e_cross
        + result["dft_correction"]
        + result["dft_correction_beta"]
        + e_nuc
    )
    result["emb_dft"] = rks_e_elec
    return result
