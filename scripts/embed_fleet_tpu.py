"""Embedded-energy conformer fleet on the real TPU.

Drives :func:`nbed_tpu.parallel.batched_embedding_energies` — the whole
mu-embedding pipeline (global KS -> SPADE -> subsystem decomposition ->
embedded HF -> assembly) vmapped over a geometry batch — on whatever
backend JAX resolves (axon TPU in this environment; set
JAX_PLATFORMS=cpu for a local run), and prints one JSON line with the
fleet throughput.

Usage:  timeout 3600 python scripts/embed_fleet_tpu.py [B] [n_act]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WATER = (ROOT / "tests" / "molecules" / "water.xyz").read_text()


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_act = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax

    from nbed_tpu.chem import build_molecule
    from nbed_tpu.parallel import batched_embedding_energies

    mol = build_molecule(WATER, "sto-3g")
    base = np.asarray(mol.coords)
    coords = np.repeat(base[None], b, axis=0)
    coords[:, 2, 2] += np.linspace(0.0, 0.04, b)

    t0 = time.perf_counter()
    out = batched_embedding_energies(
        mol, coords, n_active_atoms=1, n_act_mos=n_act, xc="b3lyp",
        grid_level=1, conv_tol=1e-9, dm_conv_tol=1e-7,
    )
    e = np.asarray(out["e_emb_rhf"])
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = batched_embedding_energies(
        mol, coords, n_active_atoms=1, n_act_mos=n_act, xc="b3lyp",
        grid_level=1, conv_tol=1e-9, dm_conv_tol=1e-7,
    )
    np.asarray(out["e_emb_rhf"])
    warm = time.perf_counter() - t0

    print(json.dumps({
        "backend": jax.default_backend(),
        "batch": b,
        "fleet_cold_s": round(cold, 2),
        "fleet_warm_s": round(warm, 2),
        "embedded_conformers_per_s_warm": round(b / warm, 3),
        "e_emb_rhf_lane0": float(e[0]),
        "all_converged": bool(np.all(np.asarray(out["converged"]))),
    }))


if __name__ == "__main__":
    main()
