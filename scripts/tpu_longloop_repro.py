"""Chemistry-free repro for the v5e "long while_loop program kills the
worker" failure (round-3 finding; VERDICT r4 #4).

Observed in the SCF engine: the streaming-XC SCF program — a
``lax.while_loop`` (cycle loop) whose body runs a ``lax.fori_loop``
accumulator over grid chunks — executes fine for 1-3 cycles but
hard-crashes the TPU worker at high cycle counts, at ANY grid size
(``scripts/pfoa_tpu_bisect.py``).  Since round 4 the cycle bound is a
TRACED operand, so the 3-cycle and 50-cycle runs execute the IDENTICAL
compiled program: the crash is a function of RUNTIME execution, not of
program size.  The two candidate triggers are total device-side
execution WALL TIME (a worker/RPC execution watchdog) vs total ITERATION
count.

This script separates them with one jitted program shaped like the SCF
loop (while_loop carrying (2,n,n) state, body = fori_loop(M) of
matmul+tanh chunk accumulations, n=128 ~ pfoa's nao=126):

  * heavy body (M=64): ~1 s/cycle -> N cycles ~ N seconds of device wall
  * light body (M=2):  ~30 ms/cycle -> high N at small wall

Each (label, N) runs in its own subprocess (a worker crash poisons the
client); rc != 0 or an RPC error marks the crash boundary.

Run (needs the live TPU tunnel):
  timeout 3600 python scripts/tpu_longloop_repro.py
"""

import json
import subprocess
import sys
import time

CHILD = r"""
import sys, time
import jax, jax.numpy as jnp

M = int(sys.argv[1])   # inner fori_loop trip count (body heaviness)
N = int(sys.argv[2])   # outer while_loop trip count (SCF-cycle analogue)
n = 128

@jax.jit
def program(a, n_cycles):
    def inner(i, acc):
        x = jnp.tanh(acc[0] @ a + 1e-3 * i)
        y = jnp.tanh(a @ acc[1] - 1e-3 * i)
        return jnp.stack([x, y])

    def cond(carry):
        it, acc = carry
        return it < n_cycles

    def body(carry):
        it, acc = carry
        acc = jax.lax.fori_loop(0, M, inner, acc)
        return it + 1, acc / (1.0 + jnp.abs(acc).max())

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), a0))
    return acc.sum()

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (n, n), jnp.float32) / n
a0 = jnp.stack([a, a.T])
t0 = time.perf_counter()
val = float(program(a, jnp.int32(N)))
print(f"OK M={M} N={N} wall={time.perf_counter()-t0:.1f}s val={val:.4f}",
      flush=True)
"""


def run_case(m, n_cycles, timeout=900):
    t0 = time.perf_counter()
    try:
        proc = subprocess.run([sys.executable, "-c", CHILD, str(m),
                               str(n_cycles)],
                              capture_output=True, text=True, timeout=timeout)
        status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        tail = (proc.stdout.strip().splitlines() or
                proc.stderr.strip().splitlines()[-2:] or [""])[-1]
    except subprocess.TimeoutExpired:
        status, tail = "timeout", ""
    return {"M": m, "N": n_cycles, "status": status,
            "wall_s": round(time.perf_counter() - t0, 1), "tail": tail[:300]}


def main():
    cases = [
        # heavy body: scan device-wall dimension (~1 s/cycle after compile)
        (64, 3), (64, 10), (64, 30), (64, 100), (64, 300),
        # light body: scan iteration dimension at small wall
        (2, 100), (2, 1000), (2, 10000),
    ]
    for m, n_cycles in cases:
        res = run_case(m, n_cycles)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
