"""Benchmarks: real-pipeline wall time + Fock throughput + JW terms/sec.

Prints ONE JSON line with the headline Fock-build metric and the
real-pipeline numbers the BASELINE.md targets track:

  {"metric": "fock_build_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": M, "embed_pipeline_wall_s": W, "embed_pipeline_warm_s": W2,
   "embedded_scf_wall_s": S, "jw_terms_per_s": T, "jw_terms": K}

- fock_build_gflops: jitted on-device f32 J/K supermatrix build at nao=128
  (1 GB operand, HBM-bound — the design's TPU hot path: the incremental
  mixed-precision SCF contracts density changes in f32 and pays emulated
  f64 only on periodic rebases).  vs_baseline is the measured speedup over
  the same contraction in single-thread f64 numpy on the host CPU (the
  reference's PySCF-CPU Fock path analogue); the emulated-f64 device cost
  is measured separately at nao=64 (details).
- embed_pipeline_wall_s / _warm_s: the full reference-parity water pipeline
  (`nbed(... projector='mu', CCSD+FCI)`), cold (includes jit compiles; the
  persistent compile cache makes this the steady state for repeated runs)
  and warm (second driver in-process: compile-cache hits only).
- embedded_scf_wall_s: the mu-embedded SCF stage from the driver's stage
  timers.
- jw_terms_per_s: Jordan-Wigner term generation on the full-system water
  Hamiltonian (qubit-Hamiltonian terms/sec is a BASELINE.md tracked metric).

Details land in bench_details.json.  Set NBED_BENCH_SKIP_PIPELINE=1 to skip
the pipeline stage (e.g. on a cold remote tunnel).

Robustness: every stage runs in its own SUBPROCESS with a hard timeout.
SIGALRM cannot interrupt a native XLA wait (a wedged remote-compile tunnel
hangs the process forever and the alarm only fires after the native call
returns), so in-process guards are not enough — a stuck tunnel must not
cost the whole benchmark.  A preflight probe checks the device is actually
reachable; if not, the stages fall back to CPU and the JSON line says so
(``backend: cpu-fallback``) rather than reporting nothing.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

WATER = (
    "3\n\n"
    "O   0.0000  0.000  0.115\n"
    "H   0.0000  0.754  -0.459\n"
    "H   0.0000  -0.754  -0.459\n"
)


class _Timeout(Exception):
    pass


def _alarm(seconds):
    def handler(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _gen_g(n2, dtype):
    """Deterministic on-device operand: a 2+ GB host->device transfer over a
    remote-TPU tunnel can take longer than the benchmark, device RNG needs
    workspace that can OOM next to the supermatrix, and a closure-captured
    array would be serialized into the remote-compile request (HTTP 413) —
    so build it from iotas and pass it as a jit argument."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen():
        ii = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
        return ((ii * 31 + jj * 17) % 1013).astype(dtype) / (1013.0 * n2)

    return gen().block_until_ready()


def bench_fock(details):
    """Fock-build throughput at nao=128 (the SCF hot loop at production
    scale). The headline is the f32 path — the design's TPU hot path (the
    incremental mixed-precision SCF contracts density *changes* in f32 and
    pays emulated f64 only on periodic rebases; a full-size f64 build needs
    22 GB of X64-split temps and does not fit one v5e). The f64 emulation
    cost is measured at nao=64 and reported in the details. vs_baseline
    compares against single-thread f64 numpy — the shape of the reference's
    PySCF-CPU Fock path."""
    import jax
    import jax.numpy as jnp

    nao = 128
    n2 = nao * nao
    flops_per_build = 2.0 * n2 * n2 + 2.0 * 2.0 * n2 * n2  # J + 2 K matvecs

    _log(f"fock: generating {n2}x{n2} f32 operand on {jax.devices()[0]}")
    g_d = _gen_g(n2, jnp.float32)
    rng = np.random.default_rng(0)
    dm_host = rng.standard_normal((2, nao, nao))
    dm_host = dm_host + dm_host.swapaxes(-1, -2)
    dm_d = jnp.asarray(dm_host, jnp.float32)

    import functools

    def time_chained(build, g, dm, n_lo=5, n_hi=505):
        """Per-build device time via an on-device fori_loop chain (each
        build feeds the next), differencing two loop lengths to cancel the
        dispatch + readback constant: over the remote tunnel,
        block_until_ready is not a completion barrier and readbacks can
        stall for a long time, so per-dispatch host timing is useless."""

        @functools.partial(jax.jit, static_argnums=2)
        def chain(g, dm, n):
            return jax.lax.fori_loop(0, n, lambda i, d: build(g, d), dm)

        for n in (n_lo, n_hi):  # compile + one warm readback each
            np.asarray(chain(g, dm, n)[0, :2, :2])
        t = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            np.asarray(chain(g, dm, n)[0, :2, :2])
            t[n] = time.perf_counter() - t0
        return max((t[n_hi] - t[n_lo]) / (n_hi - n_lo), 1e-9)

    def fock_body(g, dm):
        j = (g @ (dm[0] + dm[1]).reshape(-1)).reshape(nao, nao)
        k = (g @ dm.reshape(2, n2).T).T.reshape(2, nao, nao)
        return j[None] - k

    _log("fock: compiling f32 device build")
    t_dev = time_chained(fock_body, g_d, dm_d)
    _log(f"fock: f32 device {t_dev * 1e3:.2f} ms/build")
    details.update(
        device=str(jax.devices()[0]), fock_nao=nao,
        t_fock_f32_device_s=t_dev,
        f32_gflops=flops_per_build / t_dev / 1e9,
    )

    # fused Pallas f32 J/K kernel (the engine's TPU fast path) — TPU only
    if jax.default_backend() == "tpu":
        try:
            from nbed_tpu.ops.pallas_jk import fused_jk

            def pallas_build(g, dm):
                j, k = fused_jk(g, g, dm)
                return j[None] - k  # (2, nao, nao) veff -> next density

            t_pallas = time_chained(pallas_build, g_d, dm_d)
            _log(f"fock: pallas fused {t_pallas * 1e3:.2f} ms/build")
            details["t_fock_pallas_f32_s"] = t_pallas
            details["pallas_f32_gflops"] = flops_per_build / t_pallas / 1e9
        except Exception as exc:
            details["pallas_error"] = repr(exc)

    # emulated-f64 cost, measured at a size whose X64-split temps fit HBM
    try:
        nao64 = 64
        m2 = nao64 * nao64
        g64 = _gen_g(m2, jnp.float64)
        dm64 = jnp.asarray(dm_host[:, :nao64, :nao64], jnp.float64)

        def fock64_body(g, dm):
            j = (g @ (dm[0] + dm[1]).reshape(-1)).reshape(nao64, nao64)
            k = (g @ dm.reshape(2, m2).T).T.reshape(2, nao64, nao64)
            return j[None] - k

        _log("fock: compiling f64 device build (nao=64)")
        t_dev64 = time_chained(fock64_body, g64, dm64)
        flops64 = 2.0 * m2 * m2 + 4.0 * m2 * m2
        _log(f"fock: f64 device (nao=64) {t_dev64 * 1e3:.2f} ms/build")
        details["t_fock_f64_nao64_s"] = t_dev64
        details["f64_nao64_gflops"] = flops64 / t_dev64 / 1e9
    except Exception as exc:
        details["f64_error"] = repr(exc)

    # single-thread f64 numpy baseline (the reference's PySCF-CPU shape)
    g_np = (rng.standard_normal((n2, n2)) / n2).astype(np.float64)

    def fock_np(dm):
        j = (g_np @ (dm[0] + dm[1]).reshape(-1)).reshape(nao, nao)
        k = (g_np @ dm.reshape(2, n2).T).T.reshape(2, nao, nao)
        return j[None] - k

    fock_np(dm_host)
    n_np = 3
    t0 = time.perf_counter()
    for _ in range(n_np):
        fock_np(dm_host)
    t_np = (time.perf_counter() - t0) / n_np
    _log(f"fock: numpy f64 {t_np * 1e3:.1f} ms/build")
    details["t_fock_numpy_f64_s"] = t_np
    details["numpy_f64_gflops"] = flops_per_build / t_np / 1e9

    return flops_per_build / t_dev / 1e9, t_np / t_dev


def bench_pipeline(details):
    """Full embed() wall time, cold and warm (reference-parity config)."""
    from nbed_tpu import nbed

    kwargs = dict(
        geometry=WATER, n_active_atoms=1, basis="STO-3G",
        xc_functional="b3lyp", projector="mu", localization="spade",
        convergence=1e-6, run_ccsd_emb=True, run_fci_emb=True,
    )
    t0 = time.perf_counter()
    nbed(**kwargs)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    driver = nbed(**kwargs)
    warm = time.perf_counter() - t0
    # stage walls from the WARM driver: the cold one folds jit compiles
    # (and, over the remote tunnel, remote-compile latency) into stages
    timings = dict(getattr(driver, "timings", {}))
    details["pipeline_stage_timings_s"] = {
        k: round(v, 4) for k, v in timings.items()
    }
    scf_wall = timings.get("mu_embed")
    return cold, warm, scf_wall


def bench_ccsd(details):
    """CCSD amplitude-sweep throughput, f32 vs f64 (the mixed-precision
    design in one number).  Times the jitted while_loop sweep at a
    representative embedded-active-space size (10 occupied / 48 virtual
    spin orbitals) by differencing two fixed cycle counts — the sweep runs
    entirely on device, so the scalar readback is the only barrier."""
    import jax
    import jax.numpy as jnp

    from nbed_tpu.solvers.ccsd import _make_sweep

    # 10/48: the 12/60 sweep's remote compile overran the stage alarm on
    # every TPU bench run since round 2 (ccsd_error: timeout(alarm)) —
    # this size compiles within budget and measures the same f64/f32 ratio
    no, nv = 10, 48
    m = no + nv
    rng = np.random.default_rng(3)
    w = rng.standard_normal((m, m, m, m)) * 1e-3
    w = w - w.transpose(0, 1, 3, 2)
    w = w + w.transpose(2, 3, 0, 1).conj()
    fock = np.diag(np.concatenate([-np.arange(no)[::-1] - 1.0,
                                   np.arange(nv) + 0.5]))
    eps = np.diag(fock)
    o = slice(0, no)
    d1 = eps[o, None] - eps[None, no:]
    d2 = (eps[o, None, None, None] + eps[None, o, None, None]
          - eps[None, None, no:, None] - eps[None, None, None, no:])
    t1 = np.zeros((no, nv))
    t2 = w[o, o, no:, no:] / d2
    sweep = _make_sweep(no, nv, 6)

    def time_sweep(dtype, n_lo=3, n_hi=23):
        ops = tuple(jnp.asarray(a, dtype) for a in (fock, w, d1, d2))
        amps = (jnp.asarray(t1, dtype), jnp.asarray(t2, dtype))
        zero = jnp.asarray(0.0, dtype)  # conv_tol 0: never exits early
        t = {}
        for n in (n_lo, n_hi):  # compile + warm readback
            float(sweep(*ops, *amps, zero, zero, jnp.int32(n))[2])
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            float(sweep(*ops, *amps, zero, zero, jnp.int32(n))[2])
            t[n] = time.perf_counter() - t0
        return max((t[n_hi] - t[n_lo]) / (n_hi - n_lo), 1e-9)

    with jax.default_matmul_precision("float32"):
        t32 = time_sweep(jnp.float32)
    _log(f"ccsd: f32 sweep {t32 * 1e3:.1f} ms/iter (no={no}, nv={nv})")
    t64 = time_sweep(jnp.float64)
    _log(f"ccsd: f64 sweep {t64 * 1e3:.1f} ms/iter")
    details["ccsd_no_nv"] = (no, nv)
    details["ccsd_f32_iter_s"] = t32
    details["ccsd_f64_iter_s"] = t64
    details["ccsd_f64_over_f32"] = round(t64 / t32, 2)
    return t64 / t32


def bench_jw(details):
    """JW term generation throughput on the full-system water Hamiltonian."""
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.ham.builder import HamiltonianBuilder
    from nbed_tpu.ham.qubit import jordan_wigner
    from nbed_tpu.scf.engine import SCFEngine

    mol = build_molecule(WATER, "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-10, max_cycle=100).kernel()
    const, h1, h2 = HamiltonianBuilder(sol, 0.0).build()
    jordan_wigner(const, h1, h2)  # warm any caches
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        psum = jordan_wigner(const, h1, h2)
    dt = (time.perf_counter() - t0) / n_rep
    details["jw_qubits"] = int(h1.shape[0])

    # paper-scale throughput: dense random 28-spin-orbital Hamiltonian
    # (the reference's publication systems land at 26-36 qubits; term count
    # and cost depend only on sparsity/size, not on the physics)
    nso = 28
    rng = np.random.default_rng(7)
    h1_big = rng.standard_normal((nso, nso))
    h1_big = h1_big + h1_big.T
    h2_big = rng.standard_normal((nso,) * 4) * 0.05
    jordan_wigner(0.0, h1_big[:4, :4], h2_big[:4, :4, :4, :4])  # warm caches
    t0 = time.perf_counter()
    psum_big = jordan_wigner(0.0, h1_big, h2_big)
    dt_big = time.perf_counter() - t0
    details["jw28_qubits"] = nso
    details["jw28_terms"] = len(psum_big.terms)
    details["jw28_terms_per_s"] = round(len(psum_big.terms) / dt_big, 1)

    return len(psum.terms), len(psum.terms) / dt


def bench_batch(details):
    """Conformer-fleet throughput: vmapped HF over a geometry batch (one
    compiled program, the data-parallel scale lever — BASELINE config #5).
    Times the warm B=16 and B=1 programs; the interesting numbers are
    conformers/sec and the per-conformer speedup the batching buys."""
    import jax.numpy as jnp

    from nbed_tpu.chem import build_molecule
    from nbed_tpu.parallel import batched_hf_energies

    mol = build_molecule(WATER, "sto-3g")
    base = np.asarray(mol.coords)  # bohr
    # B=8: the B=16 program's remote compile overran the stage budget on
    # cold caches (batch_error: timeout(alarm) in two round-3 runs);
    # half the program size still demonstrates fleet throughput + lane
    # efficiency and completes reliably over the tunnel
    bsz = 8
    rng = np.random.default_rng(11)
    batch = base[None] + 0.02 * rng.standard_normal((bsz, *base.shape))
    batch[0] = base

    def run(coords):
        e, conv = batched_hf_energies(mol, jnp.asarray(coords),
                                      conv_tol=1e-8, max_cycle=100)
        return np.asarray(e), np.asarray(conv)

    _log(f"batch: compiling vmapped HF (B={bsz})")
    e, conv = run(batch)  # compile + warm readback
    # a marginal random lane may hit max_cycle on the TPU's noisier DIIS;
    # report it instead of failing the whole stage
    details["batch_lanes_converged"] = int(conv.sum())
    # oracle anchor: lane 0 is the unperturbed geometry
    assert bool(conv[0]) and abs(e[0] - (-74.96099960129165)) < 1e-6, e[0]
    t0 = time.perf_counter()
    run(batch)
    t_batch = time.perf_counter() - t0

    single = batch[:1]
    run(single)  # compile B=1
    t0 = time.perf_counter()
    run(single)
    t_single = time.perf_counter() - t0

    details["batch_size"] = bsz
    details["batch_wall_s"] = round(t_batch, 4)
    details["single_wall_s"] = round(t_single, 4)
    details["batch_lane_efficiency"] = round(t_single * bsz / t_batch, 2)
    return bsz / t_batch


def _stage_batch(out, details):
    _alarm(1500)
    cps = bench_batch(details)
    out["conformers_per_s"] = round(cps, 2)


def _stage_fock(out, details):
    # generous in-stage guard: the remote tunnel's first post-compile
    # readback can stall ~8 min cold (cached afterwards)
    _alarm(1500)
    gflops, speedup = bench_fock(details)
    out["value"] = round(gflops, 3)
    out["vs_baseline"] = round(speedup, 3)


def _stage_pipeline(out, details):
    _alarm(2100)
    _log("pipeline: running embed() cold")
    cold, warm, scf_wall = bench_pipeline(details)
    out["embed_pipeline_wall_s"] = round(cold, 3)
    out["embed_pipeline_warm_s"] = round(warm, 3)
    if scf_wall is not None:
        out["embedded_scf_wall_s"] = round(scf_wall, 3)


def _stage_ccsd(out, details):
    _alarm(1100)
    ratio = bench_ccsd(details)
    out["ccsd_f64_over_f32"] = round(ratio, 2)


def _stage_jw(out, details):
    _alarm(500)
    n_terms, terms_per_s = bench_jw(details)
    out["jw_terms"] = int(n_terms)
    out["jw_terms_per_s"] = round(terms_per_s, 1)
    if "jw28_terms_per_s" in details:
        out["jw28_terms_per_s"] = details["jw28_terms_per_s"]


def _stage_probe(out, details):
    """Trivial compile + readback: is the device actually reachable?
    Generous alarm: a degraded (not dead) tunnel has been observed to
    take ~2 min for this trivial compile+readback; only a truly wedged
    tunnel should trip the CPU fallback."""
    _alarm(540)
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jnp.ones((8, 8))
    val = float(jax.jit(lambda a: (a @ a).sum())(x))
    assert abs(val - 512.0) < 1e-6
    out["device"] = str(dev)
    out["backend"] = jax.default_backend()


_STAGES = {
    "probe": (_stage_probe, 600),
    "fock": (_stage_fock, 1800),
    "pipeline": (_stage_pipeline, 2400),
    "ccsd": (_stage_ccsd, 1400),
    "jw": (_stage_jw, 700),
    "batch": (_stage_batch, 1700),
}

_MARK = "##BENCH_STAGE_RESULT## "


def _run_stage_inprocess(stage):
    """Child-process entry: run one stage, print a marked JSON line."""
    import nbed_tpu  # noqa: F401 — applies package config (jax_enable_x64)

    fn, _ = _STAGES[stage]
    out, details = {}, {}
    try:
        fn(out, details)
        status = "ok"
    except _Timeout:
        status = "timeout(alarm)"
    except Exception as exc:  # noqa: BLE001 — report, don't crash
        status = f"error: {exc!r}"
    finally:
        signal.alarm(0)
    print(_MARK + json.dumps({"status": status, "out": out,
                              "details": details}), flush=True)


def _run_stage_subprocess(stage, env=None):
    """Hard-bounded stage run; survives native-wait wedges the in-process
    SIGALRM guard cannot interrupt."""
    _, budget = _STAGES[stage]
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    try:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=None,
            timeout=budget, env=env, text=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"{stage}: KILLED after {budget}s (hard timeout)")
        return {"status": f"timeout({budget}s, killed)", "out": {},
                "details": {}}
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_MARK):
            return json.loads(line[len(_MARK):])
    return {"status": f"no result (rc={proc.returncode})", "out": {},
            "details": {}}


def main():
    out = {"metric": "fock_build_gflops", "unit": "GFLOP/s",
           "value": 0.0, "vs_baseline": 0.0}
    details = {}

    env = dict(os.environ)
    probe = _run_stage_subprocess("probe", env=env)
    details["probe"] = probe["status"]
    if probe["status"] != "ok":
        # wedged/unreachable tunnel: fall back to CPU so the benchmark
        # still reports real (if slower) numbers, honestly labeled
        _log(f"probe failed ({probe['status']}); falling back to CPU")
        env["JAX_PLATFORMS"] = "cpu"
        # fully local compiles: bypass the axon sitecustomize + helper
        env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
        env["PYTHONPATH"] = ""
        out["backend"] = "cpu-fallback"
    else:
        out["backend"] = probe["out"].get("backend", "unknown")
        details["device"] = probe["out"].get("device")

    stages = ["fock", "pipeline", "ccsd", "jw", "batch"]
    if os.environ.get("NBED_BENCH_SKIP_PIPELINE"):
        stages.remove("pipeline")
    cpu_stage_env = dict(os.environ)
    cpu_stage_env["JAX_PLATFORMS"] = "cpu"
    cpu_stage_env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    cpu_stage_env["PYTHONPATH"] = ""
    cpu_stage_env.setdefault(
        "NBED_TPU_JAX_CACHE", os.path.expanduser("~/.cache/nbed_tpu_jax_cpu"))
    for stage in stages:
        # JW throughput is a host/native-engine metric; its in-stage SCF
        # over the tunnel occasionally stalled past the alarm (round 3)
        stage_env = cpu_stage_env if stage == "jw" else env
        res = _run_stage_subprocess(stage, env=stage_env)
        if res["status"] != "ok":
            details[f"{stage}_error"] = res["status"]
        out.update(res["out"])
        details.update(res["details"])

    # same-config CPU-backend pipeline: the in-image stand-in for the
    # reference's PySCF-CPU baseline (BASELINE.md north star is the
    # device/CPU pipeline ratio; no PySCF in this image, and our CPU
    # backend runs the identical algorithms through XLA:CPU)
    if ("pipeline" in stages and out.get("backend")
            not in (None, "cpu", "cpu-fallback")
            and not os.environ.get("NBED_BENCH_SKIP_CPU_PIPELINE")):
        cpu_env = dict(os.environ)
        cpu_env["JAX_PLATFORMS"] = "cpu"
        cpu_env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
        cpu_env["PYTHONPATH"] = ""
        cpu_env.setdefault(
            "NBED_TPU_JAX_CACHE",
            os.path.expanduser("~/.cache/nbed_tpu_jax_cpu"),
        )
        res = _run_stage_subprocess("pipeline", env=cpu_env)
        if res["status"] == "ok":
            cpu_warm = res["out"].get("embed_pipeline_warm_s")
            out["embed_pipeline_cpu_warm_s"] = cpu_warm
            tpu_warm = out.get("embed_pipeline_warm_s")
            if cpu_warm and tpu_warm:
                out["pipeline_speedup_warm"] = round(cpu_warm / tpu_warm, 2)
            details["pipeline_cpu_stage_timings_s"] = \
                res["details"].get("pipeline_stage_timings_s")
        else:
            details["pipeline_cpu_error"] = res["status"]

    print(json.dumps(out), flush=True)
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage_inprocess(sys.argv[2])
    else:
        main()
