"""Replicate the reference's headline problem-size-reduction results.

The reference's publication notebook (BASELINE.md, PRA 109, 022418) reports,
for small organics at STO-3G with SPADE + concentric localization (huzinaga
projector), the qubit-count and JW Pauli-term-count reduction from embedding.
This script reproduces those rows for the molecules whose geometries ship in
tests/molecules (published values quoted from BASELINE.md):

  molecule      qubits full -> embedded   terms full -> embedded (huz)
  acetonitrile       36 -> 28                136,075 -> 50,607
  formamide          36 -> 26                138,231 -> 37,008

Counts depend only on orbital-space sizes (2 * n_AO spin orbitals full;
active + CL-truncated virtuals embedded) and on which Pauli coefficients
survive the EQ_TOLERANCE cut, so they are reproducible without reproducing
the paper's exact SCF numerics.

Run:  PYTHONPATH= python scripts/qubit_reduction.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
os.environ.setdefault(
    "NBED_TPU_JAX_CACHE", os.path.expanduser("~/.cache/nbed_tpu_jax_cpu")
)

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nbed_tpu.chem import build_molecule  # noqa: E402
from nbed_tpu.config import NbedConfig  # noqa: E402
from nbed_tpu.driver import NbedDriver  # noqa: E402
from nbed_tpu.ham.builder import HamiltonianBuilder  # noqa: E402
from nbed_tpu.ham.qubit import jordan_wigner  # noqa: E402
from nbed_tpu.scf.engine import SCFEngine  # noqa: E402

MOLECULES = Path(__file__).resolve().parent.parent / "tests" / "molecules"

# (xyz file, n_active_atoms, published full->embedded qubits, full->emb terms)
CASES = [
    ("acetonitrile.xyz", 2, (36, 28), (136_075, 50_607)),
    ("formamide.xyz", 3, (36, 26), (138_231, 37_008)),
]


def main():
    for fname, n_active, pub_qubits, pub_terms in CASES:
        xyz = (MOLECULES / fname).read_text()

        # full system
        mol = build_molecule(xyz, "sto-3g")
        sol = SCFEngine(mol, conv_tol=1e-8, max_cycle=200).kernel()
        const, h1, _h2 = (hb := HamiltonianBuilder(sol, 0.0)).build()
        full_qubits = h1.shape[0]
        full_terms = len(jordan_wigner(*hb.build()).terms)

        # embedded (SPADE + huzinaga + concentric localization)
        cfg = NbedConfig(
            geometry=str(MOLECULES / fname), n_active_atoms=n_active,
            basis="STO-3G", xc_functional="b3lyp", projector="huzinaga",
            localization="spade", convergence=1e-6,
            run_ccsd_emb=False, run_fci_emb=False,
        )
        d = NbedDriver(cfg)
        d.embed()
        e_const, e_h1, e_h2 = d.huzinaga["second_quantised"]
        emb_qubits = e_h1.shape[0]
        emb_terms = len(jordan_wigner(e_const, e_h1, e_h2).terms)

        name = fname.removesuffix(".xyz")
        print(f"{name}: qubits {full_qubits} -> {emb_qubits} "
              f"(published {pub_qubits[0]} -> {pub_qubits[1]}); "
              f"terms {full_terms:,} -> {emb_terms:,} "
              f"(published {pub_terms[0]:,} -> {pub_terms[1]:,})",
              flush=True)


if __name__ == "__main__":
    main()
