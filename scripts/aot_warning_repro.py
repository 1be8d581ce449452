"""Controlled repro: the XLA:CPU AOT "feature mismatch" warning fires for
SAME-HOST persistent-cache reloads — it is cosmetic, not foreign poisoning.

Round-4 left "cpu_aot_loader ... could lead to execution errors such as
SIGILL" warnings in test/bench tails after the cache dirs were
host-fingerprinted, which read as the fingerprint fix being incomplete.
This script shows the warnings' true origin:

1. run 1 compiles into a FRESH cache dir on this host;
2. run 2 (same host, same dir) reloads the artifact and still warns about
   exactly two "features": ``+prefer-no-scatter`` and
   ``+prefer-no-gather``.

Those are LLVM *tuning preferences* XLA's CpuCompiler adds to the compile
target on AVX512-class CPUs; the AOT loader's host-feature probe reports
real ISA features only, never tuning prefs, so the comparison can never
match — every reload on such a CPU warns, including artifacts the very
same host just wrote.  Same-host artifacts cannot actually SIGILL.

Measured on this image (2026-08-20): run 1 -> 0 warnings, run 2 -> exactly
the two lines above; with ``--xla_cpu_max_isa=AVX2`` (no tuning prefs) ->
0 warnings on reload at ~12% CPU throughput cost (1500^2 f64 GEMM
199 -> 223 ms).  tests/conftest.py and __graft_entry__._bootstrap_devices
therefore cap test/dry-run processes to AVX2; the bench CPU lanes stay
uncapped so the baseline denominator is the host's full speed.

Run:  PYTHONPATH= python scripts/aot_warning_repro.py
Expect: "run1 warnings: 0", "run2 warnings: 2 (prefer-no-scatter/gather)",
        "run2[AVX2] warnings: 0" on an AVX512 host.
"""

import os
import re
import subprocess
import sys
import tempfile

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.environ["REPRO_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

@jax.jit
def f(x):
    for _ in range(6):
        x = jnp.linalg.eigh(x @ x.T / 100 + jnp.eye(200))[1]
    return x.sum()

print(float(f(jnp.asarray(np.random.default_rng(0).normal(size=(200, 200))))))
"""


def run(cache, extra_env=None):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["REPRO_CACHE"] = cache
    env.update(extra_env or {})
    proc = subprocess.run([sys.executable, "-c", CHILD], env=env,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    warns = re.findall(r"Target machine feature (\S+)", proc.stderr)
    return warns


def main():
    with tempfile.TemporaryDirectory() as cache:
        print("run1 warnings:", len(run(cache)))
        w2 = run(cache)
        print(f"run2 warnings: {len(w2)} {w2}")
    with tempfile.TemporaryDirectory() as cache:
        flags = {"XLA_FLAGS": "--xla_cpu_max_isa=AVX2"}
        run(cache, flags)
        print("run2[AVX2] warnings:", len(run(cache, flags)))


if __name__ == "__main__":
    main()
