"""Attempt to reproduce the reference's standalone-Huzinaga MO-energy oracles.

The reference asserts hard-coded MO energies for `huzinaga_scf` fed with
*mixed* fixtures (reference tests/test_scf.py:19-134): the SCF object is
built on tests/molecules/water.xyz (O at z=0.115 A), while the embedding
potential and environment density come from `spinless_driver`, whose
geometry is a DIFFERENT water (raw string, O at the origin —
reference tests/conftest.py:104-115).  For cross-geometry densities the
Huzinaga premise D S D = D is false, and the oracles encode whatever state
the historical fixture chain produced.

This script re-runs the exact reference algorithm — a line-faithful numpy
replica of reference scf/huzinaga_scf.py:93-206 (same initial guess, same
Fock assembly, same convergence test), with hcore/S/veff supplied by this
package's integrals+XC stack, which matches the reference's PySCF backend
to ~1e-7 on every *matched* oracle (docs/ACCURACY.md) — on exactly those
mixed fixture inputs, and prints the resulting MO energies next to the
asserted oracle values.

Observed result: the replica converges, but its MO energies do not match
the asserted oracle values; the premise-violation term ||D S D - D|| of the
cross-geometry environment density is printed as the explanation.  The
Huzinaga machinery itself IS oracle-validated end-to-end through the driver
tests (embedded CCSD/FCI, DFT-in-DFT identity); our tests/test_scf.py
asserts the algorithm's defining properties on matched inputs instead.

Run:  PYTHONPATH= python scripts/huzinaga_oracle_repro.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
os.environ.setdefault(
    "NBED_TPU_JAX_CACHE", os.path.expanduser("~/.cache/nbed_tpu_jax_cpu")
)

from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nbed_tpu.chem import build_molecule  # noqa: E402
from nbed_tpu.config import NbedConfig  # noqa: E402
from nbed_tpu.driver import NbedDriver  # noqa: E402
from nbed_tpu.scf.engine import SCFEngine  # noqa: E402

# reference tests/test_scf.py:83-94 (RHF case)
ORACLE_RHF_MO = np.array([
    -19.346243, -0.59741322, 0.12747464, 0.6132579, 0.79561917,
    3.56833278, 4.1655741,
])

SPINLESS_XYZ = (  # reference tests/conftest.py:105-107
    "3\n \nH\t0.2774\t0.8929\t0.2544\nO\t0\t0\t0\nH\t0.6068\t-0.2383\t-0.7169"
)


def reference_huzinaga_rhf(engine, v_emb, dm_env, max_cycle=50,
                           conv_tol=1e-9, dm_conv_tol=1e-6):
    """Line-faithful replica of reference scf/huzinaga_scf.py:93-206 for the
    restricted-HF case (veff = J - 0.5 K on the total density)."""
    s = np.asarray(engine.s)
    hcore = np.asarray(engine.hcore)
    w, v = np.linalg.eigh(s)
    s_neg_half = (v / np.sqrt(w)[None, :]) @ v.T
    nocc = engine.mol.nelec[0]

    def get_veff(dm):
        # RHF: veff = J(D) - K(D)/2 with D the total density
        j, k = engine.get_jk(0.5 * np.stack([dm, dm]))
        return np.asarray(j) - 0.5 * np.asarray(k[0] + k[1])

    def huz_op(fock, dm_occ_s):
        fds = fock @ dm_occ_s
        return -0.5 * (fds + fds.T)  # restricted factor, huzinaga_scf.py:79-80

    dm_occ_s = dm_env @ s

    # initial guess from the modified core Hamiltonian (huzinaga_scf.py:139-148)
    fock = hcore + v_emb
    fock = fock + huz_op(fock, dm_occ_s)
    mo_e, c_ortho = np.linalg.eigh(s_neg_half @ fock @ s_neg_half)
    c = s_neg_half @ c_ortho
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T

    e_prev, conv = 0.0, False
    for i in range(max_cycle):
        vhf = get_veff(dm)
        fock = hcore + v_emb + vhf
        huz = huz_op(fock, dm_occ_s)
        fock = fock + huz
        mo_e, c_ortho = np.linalg.eigh(s_neg_half @ fock @ s_neg_half)
        c = s_neg_half @ c_ortho
        dm_old = dm
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        ham = hcore + v_emb + 0.5 * vhf + huz  # huzinaga_scf.py:181-186
        e = np.einsum("ij,ji->", ham, dm)
        if abs(e - e_prev) < conv_tol and np.linalg.norm(dm - dm_old) < dm_conv_tol:
            conv = True
            break
        e_prev = e
    return c, mo_e, dm, conv


def main():
    # fixture chain exactly as the reference: spinless_driver on the raw
    # geometry provides v_emb and dm_enviro ...
    cfg = NbedConfig(
        geometry=SPINLESS_XYZ, n_active_atoms=2, basis="STO-3G",
        xc_functional="b3lyp", projector="mu", localization="spade",
        convergence=1e-6, run_ccsd_emb=False, run_fci_emb=False,
    )
    driver = NbedDriver(cfg)
    driver.embed()
    v_emb = np.asarray(driver.embedding_potential)[0]
    dm_env = np.asarray(driver.localized_system.dm_enviro)[0] * 2.0  # restricted

    # ... while the SCF molecule is tests/molecules/water.xyz (different
    # geometry, reference tests/conftest.py:29-43)
    water = (Path(__file__).resolve().parent.parent
             / "tests" / "molecules" / "water.xyz").read_text()
    mol = build_molecule(water, "sto-3g")
    engine = SCFEngine(mol, conv_tol=1e-10, max_cycle=100)

    s = np.asarray(engine.s)
    dsd = dm_env @ s @ dm_env * 0.5
    print("premise check on the cross-geometry environment density:")
    print(f"  ||D S D / 2 - D||_max = {np.abs(dsd - dm_env).max():.3e} "
          "(Huzinaga requires 0)")

    c, mo_e, dm, conv = reference_huzinaga_rhf(engine, v_emb, dm_env)
    print(f"replica converged: {conv}")
    print("MO energies (replica of the reference algorithm on the exact "
          "fixture inputs):")
    print("  ", np.round(mo_e, 8).tolist())
    print("asserted oracle (reference tests/test_scf.py:83-94):")
    print("  ", ORACLE_RHF_MO.tolist())
    print(f"max |replica - oracle| = {np.abs(mo_e - ORACLE_RHF_MO).max():.3e}")


if __name__ == "__main__":
    main()
