"""Bisect the pfoa-scale TPU worker crash: which stage kills the worker?

Runs each candidate stage in ITS OWN SUBPROCESS (a worker crash poisons
the client process), smallest first:

  hf    — UHF, density-fitted, no XC (DF J/K + eigh + DIIS only)
  ks    — UKS/B3LYP, density-fitted (adds grid build + XC)

Usage:  timeout 4000 python scripts/pfoa_tpu_bisect.py [stage ...]
Default: both stages in order.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
XYZ = ROOT / "tests" / "molecules" / "pfoa.xyz"


STAGES = {
    # DF-UHF with the default TPU fast paths (reproduces the NaN)
    "hf": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50),
    # pure-f64 loop: isolates the incremental-f32 J/K path
    "hf_f64": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                   incremental_jk="off"),
    # short runs: where does the NaN first appear?
    "hf_c1": dict(density_fitting=True, max_cycle=1, incremental_jk="off"),
    "hf_c3": dict(density_fitting=True, max_cycle=3, incremental_jk="off"),
    "hf_c1_inc": dict(density_fitting=True, max_cycle=1),
    # KS adds grid + XC (crashed the worker on earlier full-pipeline runs)
    "ks": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
               xc="b3lyp"),
    # LDA: no density gradients / grad-AO tables — isolates the GGA ops
    "ks_lda": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                   xc="svwn"),
    # 4x smaller grid — isolates grid-size-driven memory
    "ks_grid1": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                     xc="b3lyp", grid_level=1),
    # pure-f64 loop: removes the f32 XC fast path + incremental machinery
    "ks_f64": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                   xc="b3lyp", incremental_jk="off"),
    # force streaming XC (per-chunk AO recomputation, O(chunk*nao) memory)
    "ks_stream": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                      xc="b3lyp"),
    # force table XC at the full level-3 grid (1.5 GB f64 AO tables)
    "ks_table": dict(density_fitting=True, conv_tol=1e-6, max_cycle=50,
                     xc="b3lyp"),
    # streaming-crash scale probes: same forced-stream program at a 4x
    # smaller grid / without gradient tables — does the worker crash
    # depend on grid size or on the GGA gradient path?
    "ks_stream_grid1": dict(density_fitting=True, conv_tol=1e-6,
                            max_cycle=50, xc="b3lyp", grid_level=1),
    "ks_stream_lda": dict(density_fitting=True, conv_tol=1e-6,
                          max_cycle=50, xc="svwn"),
    # one-cycle stream: crash at first dispatch or mid-run?
    # (2026-08-19: rc=0 after the fori_loop XC rewrite — the lax.map
    # program crashed instantly; full-SCF streaming still crashes, see
    # ks_stream_grid1. The remaining trigger is cycle count and/or the
    # smaller-grid program shapes.)
    "ks_stream_c1": dict(density_fitting=True, max_cycle=1, xc="b3lyp"),
    # three cycles at the FULL grid: separates "more cycles" from
    # "grid1 shapes" as the remaining crash trigger
    "ks_stream_c3": dict(density_fitting=True, max_cycle=3, xc="b3lyp"),
    # three cycles at the full grid with the f32/incremental fast
    # paths disabled
    "ks_stream_c3_f64": dict(density_fitting=True, max_cycle=3, xc="b3lyp",
                             incremental_jk="off"),
}


def _apply_overrides(name, eng):
    if name.startswith("ks_stream"):
        eng.max_memory_mb = 0.0  # _XC_TABLE_LIMIT -> 0: always stream
    if name == "ks_table":
        eng.max_memory_mb = 4e13  # _XC_TABLE_LIMIT -> 1e18: never stream
    return eng


def _stage(name):
    sys.path.insert(0, str(ROOT))
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule(XYZ.read_text(), "sto-3g")
    print(f"[{name}] nao={mol.nao}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    eng = _apply_overrides(name, SCFEngine(mol, **STAGES[name]))
    sol = eng.kernel()
    wall = time.perf_counter() - t0
    out = {"stage": name, "e_tot": float(sol.e_tot),
           "converged": bool(sol.converged), "wall_s": round(wall, 1)}
    if eng.xc is not None:
        out["grid_points"] = int(eng._grid[0].shape[0])
    print(json.dumps(out), flush=True)


def main():
    stages = sys.argv[1:] or ["hf", "ks"]
    for name in stages:
        cmd = [sys.executable, str(Path(__file__).resolve()), "--run", name]
        try:
            proc = subprocess.run(cmd, timeout=2700, text=True,
                                  stdout=subprocess.PIPE)
            print(f"=== {name}: rc={proc.returncode}")
            for line in proc.stdout.splitlines()[-3:]:
                print(line)
        except subprocess.TimeoutExpired:
            print(f"=== {name}: TIMEOUT")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        _stage(sys.argv[2])
    else:
        main()
