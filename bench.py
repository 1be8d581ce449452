"""Benchmark: Fock-build throughput (J+K from ERI supermatrices) on device.

Prints ONE JSON line:
  {"metric": "fock_build_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": M}
where vs_baseline is the measured speedup of the jitted on-device Fock build
over the identical single-thread numpy contraction on the host CPU — the
direct analogue of the reference's PySCF-CPU Fock path (BASELINE.md tracked
metric "Fock-build GFLOP/s"). Details (pipeline wall time on water) go to
bench_details.json.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    nao = 64  # mid-size organic in a split-valence basis
    n2 = nao * nao
    rng = np.random.default_rng(0)
    g_j = rng.standard_normal((n2, n2)) * (1.0 / n2)
    g_k = rng.standard_normal((n2, n2)) * (1.0 / n2)
    dm = rng.standard_normal((2, nao, nao))
    dm = dm + dm.swapaxes(-1, -2)

    flops_per_build = 2.0 * n2 * n2 + 2.0 * 2.0 * n2 * n2  # J matvec + 2 K matvecs

    # --- device (jitted) path
    gj_d = jnp.asarray(g_j)
    gk_d = jnp.asarray(g_k)
    dm_d = jnp.asarray(dm)

    @jax.jit
    def fock(dm):
        j = (gj_d @ (dm[0] + dm[1]).reshape(-1)).reshape(nao, nao)
        k = (gk_d @ dm.reshape(2, n2).T).T.reshape(2, nao, nao)
        return j[None] - k

    fock(dm_d).block_until_ready()  # compile
    n_rep = 50
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fock(dm_d)
    out.block_until_ready()
    t_dev = (time.perf_counter() - t0) / n_rep

    # --- single-thread numpy baseline (the reference's CPU Fock path analogue)
    def fock_np(dm):
        j = (g_j @ (dm[0] + dm[1]).reshape(-1)).reshape(nao, nao)
        k = (g_k @ dm.reshape(2, n2).T).T.reshape(2, nao, nao)
        return j[None] - k

    fock_np(dm)
    n_np = 5
    t0 = time.perf_counter()
    for _ in range(n_np):
        fock_np(dm)
    t_np = (time.perf_counter() - t0) / n_np

    gflops = flops_per_build / t_dev / 1e9
    vs_baseline = t_np / t_dev

    details = {
        "device": str(jax.devices()[0]),
        "nao": nao,
        "t_device_s": t_dev,
        "t_numpy_s": t_np,
        "numpy_gflops": flops_per_build / t_np / 1e9,
    }

    print(json.dumps({
        "metric": "fock_build_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)

    # optional end-to-end pipeline timing (slow to compile over the TPU
    # tunnel; enable with NBED_BENCH_FULL=1)
    if os.environ.get("NBED_BENCH_FULL"):
        try:
            from nbed_tpu import nbed

            xyz = (
                "3\n\nO   0.0000  0.000  0.115\n"
                "H   0.0000  0.754  -0.459\nH   0.0000  -0.754  -0.459\n"
            )
            t0 = time.perf_counter()
            nbed(geometry=xyz, n_active_atoms=1, basis="STO-3G",
                 xc_functional="b3lyp", projector="mu", localization="spade",
                 convergence=1e-6, run_ccsd_emb=True, run_fci_emb=True)
            details["embed_pipeline_wall_s"] = time.perf_counter() - t0
        except Exception as exc:
            details["embed_pipeline_error"] = repr(exc)

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
