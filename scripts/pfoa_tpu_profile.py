"""PFOA-scale pipeline on the real TPU: the round-3 worklist profile.

Runs the same full pipeline as scripts/pfoa_pipeline.py (126 AOs, auto-DF,
SAD guess, streaming XC) but on the TPU backend, with the driver's stage
timers, and prints a compact JSON profile.  Over the remote-axon tunnel the
first run folds remote-compile latency into every stage; run twice in one
process (the second pass is the steady state, all compile-cache hits).

The water-scale TPU profile (bench.py) is dispatch-latency-bound — the
interesting question at pfoa scale is whether the per-iteration device work
(DF J/K GEMMs at nao=126, naux~500) amortises the tunnel overhead.

Run:  timeout 3600 python scripts/pfoa_tpu_profile.py [mu|huzinaga]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nbed_tpu import nbed  # noqa: E402

XYZ = Path(__file__).resolve().parent.parent / "tests" / "molecules" / "pfoa.xyz"


def run_once(projector):
    t0 = time.perf_counter()
    driver = nbed(
        geometry=str(XYZ),
        n_active_atoms=4,
        basis="STO-3G",
        xc_functional="b3lyp",
        projector=projector,
        localization="spade",
        convergence=1e-6,
        run_ccsd_emb=False,
        run_fci_emb=False,
    )
    wall = time.perf_counter() - t0
    return driver, wall


def main():
    projector = sys.argv[1] if len(sys.argv) > 1 else "mu"
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    out = {"device": str(dev), "projector": projector, "nao": 126}
    for label in ("cold", "warm"):
        driver, wall = run_once(projector)
        res = driver.mu if projector == "mu" else driver.huzinaga
        out[f"{label}_wall_s"] = round(wall, 2)
        out[f"{label}_stages_s"] = {
            k: round(v, 2) for k, v in dict(getattr(driver, "timings", {})).items()
        }
        out[f"{label}_converged"] = bool(res["scf"].converged)
        out[f"{label}_e_embedded"] = float(res["scf"].e_tot)
        print(json.dumps(out), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
