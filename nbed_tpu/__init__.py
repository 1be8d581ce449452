"""nbed_tpu: TPU-native projection-based embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of UCL-CCS/Nbed
(reference: /root/reference, see SURVEY.md). Unlike the reference — which
orchestrates PySCF's C cores — every layer here is self-contained and
TPU-first:

- integrals: McMurchie–Davidson one-/two-electron Gaussian integrals as
  jit-compiled JAX kernels (batched over shell classes, MXU-friendly
  contraction assembly).
- scf: a functional SCF engine (RHF/UHF/RKS/UKS) with DIIS, level shifting,
  embedding potentials and Huzinaga projectors threaded explicitly (no
  monkey-patched ``get_hcore`` — cf. reference driver.py:527-529).
- dft: exchange-correlation functionals (Slater, B88, VWN-RPA/VWN5, LYP,
  B3LYP composite) evaluated on a Becke-partitioned molecular grid.
- localizers: SPADE / PM / Boys / IBO occupied localization, concentric +
  PAO virtual localization, ACE-of-SPADE (reference nbed/localizers/).
- ham: AO→MO transforms and second-quantised spin-orbital Hamiltonians with
  Jordan-Wigner / Bravyi-Kitaev qubit mappings (reference ham_builder.py).
- solvers: exact-diagonalisation FCI and spin-orbital CCSD reference solvers.
- driver/embed: the projection-based-embedding pipeline with mu-shift and
  Huzinaga projectors (reference driver.py), exposed via ``nbed(config)``.
- properties: dipole moments and Mulliken/Löwdin population analysis on
  global or embedded SCF solutions (diagnostics beyond the reference).

Float64 is enabled globally: quantum chemistry needs ~1e-10 in intermediate
linear algebra to hit 1e-6 Ha end-to-end.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the integral-class kernels are compile-heavy
# and reused identically across processes (tests, bench, driver rounds).
#
# CPU caches are additionally keyed by a HOST-CPU fingerprint: JAX's cache
# key does not capture the exact machine-feature set of XLA:CPU AOT
# artifacts, so an artifact compiled on a host with (say) +prefer-no-scatter
# loads on a later host with a warning ("could lead to execution errors
# such as SIGILL") — and sometimes a real SIGSEGV in
# backend.deserialize_executable (root-caused round 4: the whole-suite
# interpreter crash was a feature-mismatched AOT reload at
# tests/test_vqe.py after the cache survived a host change between
# rounds). A fingerprinted directory simply cold-starts on new hardware.


def _host_cpu_tag() -> str:
    """Hash BOTH the feature flags and the model name: XLA:CPU AOT
    artifacts embed LLVM *tuning* attributes (e.g. +prefer-no-scatter)
    chosen per CPU model, so two hosts with identical flag lists can still
    produce feature-mismatched artifacts."""
    try:
        import hashlib

        parts = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                key, _, val = line.partition(":")
                key = key.strip()
                if key in ("flags", "model name") and key not in parts:
                    parts[key] = (" ".join(sorted(val.split()))
                                  if key == "flags" else val.strip())
        if parts:
            blob = "|".join(f"{k}={parts[k]}" for k in sorted(parts))
            return hashlib.md5(blob.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nohost"


def _default_backend_is_cpu() -> bool:
    """Will this process's default JAX backend be XLA:CPU?  Parse the
    platform list properly (not a substring test — 'tpu,cpu' must NOT
    count); with no explicit platform, CPU is the default exactly when no
    accelerator plugin is around to register itself."""
    plats = [p.strip().lower()
             for p in _os.environ.get("JAX_PLATFORMS", "").split(",")
             if p.strip()]
    if plats:
        return plats[0] == "cpu"
    if _os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # the axon sitecustomize registers a TPU backend
    try:
        from importlib.metadata import entry_points

        if list(entry_points(group="jax_plugins")):
            return False
    except Exception:
        pass
    try:
        import libtpu  # noqa: F401

        return False
    except ImportError:
        pass
    return True  # bare CPU-only install


_cache_dir = _os.environ.get(
    "NBED_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/nbed_tpu_jax")
)
if _default_backend_is_cpu():
    # only CPU-platform caches hold XLA:CPU AOT artifacts; TPU caches are
    # device-targeted and must survive host swaps (remote compiles are
    # minutes-expensive over the tunnel)
    _cache_dir = f"{_cache_dir}-{_host_cpu_tag()}"
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache is an optimisation only
    pass

from .config import NbedConfig  # noqa: E402
from .embed import nbed  # noqa: E402
from .utils import setup_logs  # noqa: E402

__all__ = ["nbed", "NbedConfig", "setup_logs"]

__version__ = "0.1.0"
