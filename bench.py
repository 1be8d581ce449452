"""Benchmarks: real-pipeline wall time + Fock throughput + JW terms/sec.

Prints the headline JSON line CUMULATIVELY — once after every completed
stage — so a harness kill at any point still leaves the latest complete
numbers on stdout (the driver keeps the last parsed line):

  {"metric": "fock_build_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": M, "embed_pipeline_wall_s": W, "embed_pipeline_warm_s": W2,
   "pipeline_speedup_warm": R, "pfoa_cycle_speedup": R2, ...}

- fock_build_gflops: jitted on-device f32 J/K supermatrix build at nao=128
  (1 GB operand, HBM-bound — the design's TPU hot path).  vs_baseline is
  the measured speedup over the same contraction in single-thread f64
  numpy on the host CPU (the reference's PySCF-CPU Fock path analogue).
- embed_pipeline_wall_s / _warm_s: the full reference-parity water pipeline
  (`nbed(... projector='mu', CCSD+FCI)`), cold and warm.
- pipeline_speedup_warm: warm pipeline, CPU backend / device backend —
  the BASELINE.md north-star ratio at water scale (dispatch-bound).
- pfoa_cycle_speedup: warm per-SCF-cycle time ratio (CPU / device) for the
  production-representative DF-UKS Fock+XC+diag cycle at pfoa scale
  (126 AOs, B3LYP, level-3 grid) — the north-star ratio where the GEMMs
  dominate.  Both sides run the identical mixed-precision incremental
  program (`incremental_jk="on"`, `jit_kernel="on"`) from the same SAD
  guess; per-cycle time comes from differencing two fixed cycle counts,
  which cancels the prologue (guess, grid, DF factor, compile).
- jw_terms_per_s: Jordan-Wigner term generation throughput.

Budgeting: the WHOLE benchmark keeps itself under a total wall budget
(env NBED_BENCH_TOTAL_BUDGET, default 900 s).  Each stage runs in its own
subprocess with timeout = min(stage cap, remaining budget); stages that no
longer fit are skipped and recorded as ``<stage>_error: "skipped(budget)"``
in bench_details.json.  Stage order puts the north-star metrics first so
they survive any external kill.  A numpy-f64 headline SEED runs inline
before anything else, so ``value`` is non-zero within seconds no matter
what dies later; ``baseline: "xla-cpu-1core"`` rides with every speedup
ratio because the CPU lanes are this host's single-core XLA:CPU — a weaker
denominator than the reference's multithreaded PySCF/BLAS stack.

Robustness: every stage runs in its own SUBPROCESS with a hard timeout.
SIGALRM cannot interrupt a native XLA wait (a wedged remote-compile tunnel
hangs the process forever), so in-process guards are not enough.  A
preflight probe checks the device is actually reachable; if not, the
stages fall back to CPU and the JSON line says so (``backend:
cpu-fallback``) rather than reporting nothing.
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

PFOA_XYZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "molecules", "pfoa.xyz")


class _Timeout(Exception):
    pass


def _alarm(seconds):
    def handler(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(int(seconds), 1))


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
    PySCF-CPU Fock path.

    Chain lengths are BACKEND-AWARE: the 505-build chain that amortises the
    remote-tunnel dispatch constant on the v5e takes >10 min of single-core
    XLA:CPU time (the round-4 bench starved every later stage on exactly
    this), so the CPU path uses a 25-build chain — noisier, but it lands.
    """
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
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
        if not on_tpu:  # single-core XLA:CPU: land, don't starve
            n_lo, n_hi = 2, 27
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
        t_dev64 = time_chained(fock64_body, g64, dm64, 5, 105)
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


def bench_pfoa(details):
    """Warm per-SCF-cycle time at pfoa scale (126 AOs, DF-UKS/B3LYP).

    Each backend runs ITS OWN production config — that is the honest
    pipeline comparison the BASELINE.md north star asks for:

    * TPU: fused jitted kernel, incremental f32 Fock with periodic f64
      rebase + equal-length f64 polish loop, table XC.  conv_tol=0 makes
      a ``max_cycle=n`` call run exactly 2n Fock builds (n coarse + n
      polish), so per-cycle = diff/(n_hi-n_lo)/2 — the polish overhead is
      FOLDED INTO the TPU per-cycle cost (conservative).
    * CPU: the plain f64 XLA:CPU path (incremental off — it exists to
      dodge TPU's emulated-f64 GEMMs and would only slow the CPU down);
      a ``max_cycle=n`` call runs n builds, per-cycle = diff/(n_hi-n_lo).

    Differencing two cycle counts cancels the prologue (SAD guess, grid
    construction, DF factor, compiles, final Fock) exactly.  Both lanes
    report e_tot after their fixed cycles; main() records the agreement.
    """
    import jax

    from nbed_tpu.chem import build_molecule
    from nbed_tpu.scf.engine import SCFEngine

    on_tpu = jax.default_backend() == "tpu"
    with open(PFOA_XYZ) as f:
        mol = build_molecule(f.read(), "sto-3g")
    eng = SCFEngine(
        mol, xc="b3lyp", density_fitting=True,
        incremental_jk="on" if on_tpu else "off",
        jit_kernel="on", warmup_f32=False,
        init_guess="sad", max_cycle=100,
    )
    dm0 = eng._sad_guess()
    # CPU lane: (1, 3) — at ~20 s/cycle plus a ~45 s fixed per-call cost
    # the (1, 5) pair overran the total-budget remainder (354 s) in the
    # full-run validation; a 2-cycle difference is noisier (~5%) but lands
    n_lo, n_hi = (2, 8) if on_tpu else (1, 3)
    builds_per_cycle = 2.0 if on_tpu else 1.0

    def run(n):
        res = eng.kernel(dm0=dm0, conv_tol=0.0, dm_conv_tol=0.0, max_cycle=n)
        return res.e_tot

    # max_cycle is a TRACED operand of the fused kernel, so n_lo and n_hi
    # share ONE compiled program.  Two warm calls, not one: the 2nd call
    # still pays a measured ~56 s one-off (persistent-cache serialization
    # of the big program) — with a single warm it landed on the timed
    # n_lo run and made t(1 cycle) > t(3 cycles) (r05 validation).
    _log(f"pfoa: nao={mol.nao}; compiling the fused-cycle program")
    for _ in range(2):
        e_last = run(n_lo)
    t = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        e_last = run(n)
        t[n] = time.perf_counter() - t0
    if t[n_hi] <= t[n_lo]:
        details["pfoa_warn"] = (
            f"non-monotonic timing: t({n_lo})={t[n_lo]:.1f}s "
            f">= t({n_hi})={t[n_hi]:.1f}s")
    per_cycle = max(
        (t[n_hi] - t[n_lo]) / (n_hi - n_lo) / builds_per_cycle, 1e-9)
    _log(f"pfoa: {per_cycle * 1e3:.1f} ms/cycle (warm), "
         f"e_tot@{n_hi}cyc={e_last:.8f}")
    details["pfoa_nao"] = int(mol.nao)
    details["pfoa_cycle_s"] = per_cycle
    details["pfoa_config"] = ("incremental-f32+f64-polish" if on_tpu
                              else "plain-f64")
    details["pfoa_e_tot_fixed_cycles"] = float(e_last)
    details["pfoa_wall_lo_hi_s"] = (round(t[n_lo], 3), round(t[n_hi], 3))
    return per_cycle, float(e_last)


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
    Times the warm B=8 and B=1 programs; the interesting numbers are
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
    cps = bench_batch(details)
    out["conformers_per_s"] = round(cps, 2)


def _stage_fock(out, details):
    gflops, speedup = bench_fock(details)
    out["value"] = round(gflops, 3)
    out["vs_baseline"] = round(speedup, 3)


def _stage_pipeline(out, details):
    _log("pipeline: running embed() cold")
    cold, warm, scf_wall = bench_pipeline(details)
    out["embed_pipeline_wall_s"] = round(cold, 3)
    out["embed_pipeline_warm_s"] = round(warm, 3)
    if scf_wall is not None:
        out["embedded_scf_wall_s"] = round(scf_wall, 3)


def _stage_pfoa(out, details):
    per_cycle, e_tot = bench_pfoa(details)
    out["pfoa_scf_cycle_s"] = round(per_cycle, 4)
    out["pfoa_e_tot_fixed_cycles"] = round(e_tot, 9)


def _stage_ccsd(out, details):
    ratio = bench_ccsd(details)
    out["ccsd_f64_over_f32"] = round(ratio, 2)


def _stage_jw(out, details):
    n_terms, terms_per_s = bench_jw(details)
    out["jw_terms"] = int(n_terms)
    out["jw_terms_per_s"] = round(terms_per_s, 1)
    if "jw28_terms_per_s" in details:
        out["jw28_terms_per_s"] = details["jw28_terms_per_s"]


def _stage_probe(out, details):
    """Trivial compile + readback: is the device actually reachable?"""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jnp.ones((8, 8))
    val = float(jax.jit(lambda a: (a @ a).sum())(x))
    assert abs(val - 512.0) < 1e-6
    out["device"] = str(dev)
    out["backend"] = jax.default_backend()


# stage -> (fn, cap seconds).  The cap is the per-stage worst case; the
# actual subprocess timeout is min(cap, remaining total budget).  The probe
# cap is deliberately short: a dead tunnel must cost ≤10% of the budget
# (round 4 burned 240 s here and starved the whole CPU-fallback plan).
_STAGES = {
    "probe": (_stage_probe, 75),
    "fock": (_stage_fock, 360),
    "pipeline": (_stage_pipeline, 480),
    "pfoa": (_stage_pfoa, 600),
    "ccsd": (_stage_ccsd, 300),
    "jw": (_stage_jw, 180),
    "batch": (_stage_batch, 300),
}

_MARK = "##BENCH_STAGE_RESULT## "


def _run_stage_inprocess(stage):
    """Child-process entry: run one stage, print a marked JSON line."""
    import nbed_tpu  # noqa: F401 — applies package config (jax_enable_x64)

    fn, _ = _STAGES[stage]
    # in-process alarm just under the parent's hard subprocess timeout, so
    # a python-interruptible stall still reports partial details
    budget = float(os.environ.get("NBED_BENCH_STAGE_BUDGET", "0"))
    if budget > 0:
        _alarm(budget - 10)
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


def _run_stage_subprocess(stage, env, timeout):
    """Hard-bounded stage run; survives native-wait wedges the in-process
    SIGALRM guard cannot interrupt."""
    env = dict(env)
    env["NBED_BENCH_STAGE_BUDGET"] = str(int(timeout))
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    try:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=None,
            timeout=timeout, env=env, text=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"{stage}: KILLED after {timeout:.0f}s (hard timeout)")
        return {"status": f"timeout({timeout:.0f}s, killed)", "out": {},
                "details": {}}
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_MARK):
            return json.loads(line[len(_MARK):])
    return {"status": f"no result (rc={proc.returncode})", "out": {},
            "details": {}}


def _cpu_env():
    """Environment for a fully local XLA:CPU stage (the in-image stand-in
    for the reference's PySCF-CPU baseline: identical algorithms, CPU
    backend), bypassing the axon sitecustomize + remote-compile helper."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["PYTHONPATH"] = ""
    env.setdefault("NBED_TPU_JAX_CACHE",
                   os.path.expanduser("~/.cache/nbed_tpu_jax_cpu"))
    return env


def _seed_headline(out, details):
    """Guarantee a NON-ZERO headline within seconds of starting: the
    single-thread f64 numpy Fock build (the baseline denominator itself,
    no XLA involved).  Every later stage only improves on this — a kill or
    wedge at any point still leaves a real measured number on stdout.
    vs_baseline is 1.0 by construction until a device stage overwrites it.
    """
    try:
        # nao=64, not the stage's 128: the 2 GB nao=128 operand takes
        # minutes to even generate on this single-core host — the seed's
        # whole job is to land in seconds (details record the size)
        nao = 64
        n2 = nao * nao
        flops = 2.0 * n2 * n2 + 2.0 * 2.0 * n2 * n2
        rng = np.random.default_rng(0)
        g_np = rng.standard_normal((n2, n2)) / n2
        dm = rng.standard_normal((2, nao, nao))

        def fock_np(d):
            j = (g_np @ (d[0] + d[1]).reshape(-1)).reshape(nao, nao)
            k = (g_np @ d.reshape(2, n2).T).T.reshape(2, nao, nao)
            return j[None] - k

        fock_np(dm)
        t0 = time.perf_counter()
        for _ in range(3):
            fock_np(dm)
        t_np = (time.perf_counter() - t0) / 3
        out["value"] = round(flops / t_np / 1e9, 3)
        out["vs_baseline"] = 1.0
        details["seed_numpy_f64_gflops"] = out["value"]
        details["seed_nao"] = nao
        _log(f"seed: numpy f64 fock {out['value']:.1f} GFLOP/s "
             f"({t_np * 1e3:.0f} ms/build)")
    except Exception as exc:  # noqa: BLE001 — the seed must never abort
        details["seed_error"] = repr(exc)


def main():
    t_start = time.monotonic()
    total_budget = float(os.environ.get("NBED_BENCH_TOTAL_BUDGET", "900"))
    out = {"metric": "fock_build_gflops", "unit": "GFLOP/s",
           "value": 0.0, "vs_baseline": 0.0,
           # denominator caveat: CPU lanes run this host's single-core
           # XLA:CPU — a weaker baseline than the reference's multithreaded
           # PySCF/BLAS stack (BASELINE.md asks for the honest comparison)
           "baseline": "xla-cpu-1core"}
    details = {}

    def remaining():
        return total_budget - (time.monotonic() - t_start)

    def emit():
        # cumulative headline after every stage: an external kill at any
        # point keeps everything completed so far (driver parses last line)
        print(json.dumps(out), flush=True)
        try:
            with open("bench_details.json", "w") as f:
                json.dump(details, f, indent=2)
        except OSError:
            pass

    _seed_headline(out, details)
    emit()

    dev_env = dict(os.environ)
    probe = _run_stage_subprocess("probe", dev_env,
                                  min(_STAGES["probe"][1], remaining()))
    details["probe"] = probe["status"]
    fallback = probe["status"] != "ok"
    if fallback:
        # wedged/unreachable tunnel: fall back to CPU so the benchmark
        # still reports real (if slower) numbers, honestly labeled
        _log(f"probe failed ({probe['status']}); falling back to CPU")
        dev_env = _cpu_env()
        out["backend"] = "cpu-fallback"
    else:
        out["backend"] = probe["out"].get("backend", "unknown")
        details["device"] = probe["out"].get("device")
    emit()

    # (stage key, run label, env kind, mode, cap override) in
    # north-star-first order: the full pipeline + its CPU lane (warm
    # speedup), then pfoa's CPU lane BEFORE its device lane — the device
    # lane's big fused program is the one compile the tunnel/helper has
    # been seen to wedge on (r05: two 880 s attempts never finished
    # compiling), so it must not be able to starve the CPU lane that
    # carries the other half of the ratio; its cap override (330 s) also
    # bounds the damage while still covering a healthy cold compile+run
    # (~230 s measured r04).  In cpu-fallback mode the order is
    # pipeline → pfoa → jw → fock: the stages that CAN finish on a
    # single-core host and that carry the north-star metrics land first
    # (round-4 failure: fock-first starved everything).
    cpu = _cpu_env()
    plan = [
        ("pipeline", "pipeline", "dev", None, 330),
        ("pipeline", "pipeline_cpu", "cpu", "cpu", None),
        ("pfoa", "pfoa_cpu", "cpu", "cpu", None),
        ("pfoa", "pfoa", "dev", None, 330),
        ("jw", "jw", "cpu", None, None),  # host/native-engine metric
        ("fock", "fock", "dev", None, None),
        ("ccsd", "ccsd", "dev", None, None),
        ("batch", "batch", "dev", None, None),
    ]
    if os.environ.get("NBED_BENCH_SKIP_PIPELINE"):
        plan = [p for p in plan if p[0] != "pipeline"]
    if fallback:
        # device lane IS the cpu lane: skip the duplicate cpu runs
        plan = [p for p in plan if p[3] != "cpu"]

    def refresh_ratios():
        """(Re)compute the speedup ratios from whatever lanes have landed
        — idempotent, so lane order and late overwrites don't matter."""
        cw = out.get("embed_pipeline_cpu_warm_s")
        tw = out.get("embed_pipeline_warm_s")
        if cw and tw and out.get("pipeline_lane") != "cpu":
            out["pipeline_speedup_warm"] = round(cw / tw, 2)
        cc = out.get("pfoa_cpu_scf_cycle_s")
        dc = out.get("pfoa_scf_cycle_s")
        if cc and dc and out.get("pfoa_lane") != "cpu":
            # the BASELINE.md north-star ratio at a scale where the GEMMs
            # dominate (TPU/CPU energy parity pinned separately:
            # docs/PERFORMANCE.md pfoa rows, 9.7e-6 Ha)
            out["pfoa_cycle_speedup"] = round(cc / dc, 2)

    # minimum-useful seconds per lane, used as RESERVATIONS: a stage may
    # only spend budget that leaves every later reserved lane its minimum
    # (r05 dress rehearsal: a contended pipeline attempt+retry burned
    # 478 s and starved BOTH pfoa lanes — the north-star metric — plus
    # jw and fock).  CPU pfoa needs ~300 s warm / ~440 cold, so its
    # reserve dominates; the pfoa device lane needs ~90 s with a warm
    # compile cache.
    def lane_reserve(label):
        if fallback:
            return {"pipeline": 100, "pfoa": 400, "jw": 30,
                    "fock": 120}.get(label, 0)
        return {"pipeline_cpu": 60, "pfoa_cpu": 360, "pfoa": 120,
                "jw": 30, "fock": 60}.get(label, 0)

    dev_kills = 0
    for idx, (stage, label, envkind, mode, cap_override) in enumerate(plan):
        env = cpu if envkind == "cpu" else dev_env
        # lane-cap overrides bound known wedge-prone device compiles; in
        # (late-)fallback the lane runs on CPU and needs the full cap
        cap = (cap_override if cap_override and envkind == "dev"
               and not fallback else _STAGES[stage][1])
        reserved = sum(lane_reserve(lbl) for _, lbl, _, _, _ in
                       plan[idx + 1:])
        left = remaining() - 15.0 - reserved
        # a reserved lane may always spend its own reserve even when the
        # schedule has slipped past the reservation plan
        left = max(left, min(lane_reserve(label), remaining() - 15.0))
        if left < 30.0:  # 30 s still lands the cheap stages (jw ~14 s)
            _log(f"{label}: skipped (budget: {left:.0f}s left)")
            details[f"{label}_error"] = "skipped(budget)"
            emit()
            continue
        t_stage = time.monotonic()
        res = _run_stage_subprocess(stage, env, min(cap, left))
        retry_left = remaining() - 15.0 - reserved
        if res["status"].startswith("timeout") and retry_left > 120.0:
            # a killed stage has already warmed the persistent compile
            # cache up to where it died — one retry gets much further
            # (cold remote compiles dominate first attempts on TPU)
            _log(f"{label}: retrying after {res['status']}")
            details[f"{label}_error_attempt1"] = res["status"]
            res = _run_stage_subprocess(stage, env,
                                        min(cap, retry_left))
        details[f"{label}_stage_wall_s"] = round(time.monotonic() - t_stage, 1)
        if res["status"] != "ok":
            details[f"{label}_error"] = res["status"]
            if envkind == "dev" and not fallback:
                # the probe passed but the tunnel has since degraded (kill,
                # wedge, or RPC error): after two dead device stages, run
                # the REST of the plan on CPU (real numbers, honestly
                # labeled) instead of feeding every remaining stage to the
                # same wedge
                dev_kills += 1
                if dev_kills >= 2:
                    _log("two device stages dead; late CPU fallback")
                    fallback = True
                    dev_env = cpu
                    out["backend"] = "cpu-fallback-late"
        if mode == "cpu":
            # CPU-lane results land under *_cpu keys; the ratios are
            # recomputed from whatever lanes exist after every stage
            details[f"{label}_details"] = res["details"]
            if stage == "pipeline" and res["status"] == "ok":
                out["embed_pipeline_cpu_warm_s"] = \
                    res["out"].get("embed_pipeline_warm_s")
            elif stage == "pfoa" and res["status"] == "ok":
                out["pfoa_cpu_scf_cycle_s"] = \
                    res["out"].get("pfoa_scf_cycle_s")
        else:
            if res["status"] == "ok" and res["out"]:
                out.pop(f"{stage}_lane", None)  # real device lane landed
            out.update(res["out"])
            details.update(res["details"])
        # a dead device lane must not lose its CPU counterpart's numbers:
        # promote them into the headline (labeled as CPU) eagerly — a later
        # successful device lane overwrites the key and drops the label
        for st, main_key, cpu_key in (
                ("pipeline", "embed_pipeline_warm_s",
                 "embed_pipeline_cpu_warm_s"),
                ("pfoa", "pfoa_scf_cycle_s", "pfoa_cpu_scf_cycle_s")):
            if out.get(main_key) is None and out.get(cpu_key) is not None:
                out[main_key] = out[cpu_key]
                out[f"{st}_lane"] = "cpu"
        refresh_ratios()
        emit()

    details["total_wall_s"] = round(time.monotonic() - t_start, 1)
    emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage_inprocess(sys.argv[2])
    else:
        main()
