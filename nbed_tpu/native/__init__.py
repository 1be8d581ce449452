"""ctypes bindings for the C++ McMurchie-Davidson integral engine.

Compiled on first use (g++ -O3) and cached next to the source. Select with
``SCFEngine(..., integrals_backend="native")`` or env
``NBED_TPU_INTEGRALS=native``: integral tensors are produced on the host by
native code (no XLA tracing cost per new molecule) and fed to the device —
the same division of labour the reference gets from PySCF's libcint core.
"""

import ctypes
import logging
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["available", "one_electron", "eri", "eri_3c", "eri_2c",
           "qubit_available", "map_terms"]

_SRC = Path(__file__).parent / "md_integrals.cpp"
_LIB = Path(__file__).parent / "libnbed_md.so"
_QSRC = Path(__file__).parent / "qubit_terms.cpp"
_QLIB = Path(__file__).parent / "libnbed_qubit.so"


@lru_cache(maxsize=1)
def _load():
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
        logger.info("Compiling native integral engine: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB))
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int32)
    lib.nbed_one_electron.argtypes = [
        ctypes.c_int, iptr, dptr, dptr, dptr, dptr, ctypes.c_int, dptr,
        ctypes.c_int, dptr, dptr, dptr, dptr, dptr, dptr,
    ]
    lib.nbed_eri.argtypes = [
        ctypes.c_int, iptr, dptr, dptr, dptr, dptr, dptr, ctypes.c_double,
    ]
    lib.nbed_eri_3c.argtypes = [
        ctypes.c_int, iptr, dptr, dptr, dptr, dptr,
        ctypes.c_int, iptr, dptr, dptr, dptr, dptr, ctypes.c_double,
    ]
    lib.nbed_eri_2c.argtypes = [
        ctypes.c_int, iptr, dptr, dptr, dptr, dptr, dptr, ctypes.c_double,
    ]
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception as exc:  # no g++ / build failure
        logger.warning("Native integral engine unavailable: %s", exc)
        return False


@lru_cache(maxsize=1)
def _load_qubit():
    if not _QLIB.exists() or _QLIB.stat().st_mtime < _QSRC.stat().st_mtime:
        cmd = ["g++", "-O3", "-shared", "-fPIC", str(_QSRC), "-o", str(_QLIB)]
        logger.info("Compiling native qubit-term engine: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(_QLIB))
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.POINTER(ctypes.c_int64)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.nbed_map_terms.argtypes = [
        ctypes.c_int,
        i64, i64, i64, i64, dptr, dptr,
        ctypes.c_int64, i32, dptr,
        ctypes.c_int64, i32, dptr,
        ctypes.c_double,
        i64, i64, dptr,
    ]
    lib.nbed_map_terms.restype = ctypes.c_int64
    return lib


def qubit_available() -> bool:
    try:
        _load_qubit()
        return True
    except Exception as exc:
        logger.warning("Native qubit-term engine unavailable: %s", exc)
        return False


def map_terms(n_modes, dx, dz, ax, az, dsc, asc, pq1, c1, pqrs2, c2, tol):
    """Generate + combine Pauli strings for a fermionic (h1, h2) operator.

    ``dx/dz/ax/az``: (2, n) int64 ladder bitmask tables; ``dsc/asc``: (2,)
    complex scalars; ``pq1`` (n1, 2) / ``pqrs2`` (n2, 4) int32 mode indices
    with complex coefficient arrays ``c1`` (n1,) / ``c2`` (n2,).
    Returns ``(x, z, coeffs)``: int64 masks + complex128 coefficients of the
    unique strings above ``tol``.
    """
    lib = _load_qubit()

    def _i64(a):
        return np.ascontiguousarray(a, dtype=np.int64)

    def _c2f(a):
        return np.ascontiguousarray(
            np.asarray(a, dtype=np.complex128)
        ).view(np.float64)

    dx, dz, ax, az = _i64(dx), _i64(dz), _i64(ax), _i64(az)
    dsc_f, asc_f = _c2f(dsc), _c2f(asc)
    pq1 = np.ascontiguousarray(pq1, dtype=np.int32).reshape(-1, 2)
    pqrs2 = np.ascontiguousarray(pqrs2, dtype=np.int32).reshape(-1, 4)
    c1f, c2f = _c2f(c1), _c2f(c2)
    n1, n2 = pq1.shape[0], pqrs2.shape[0]
    cap = 4 * n1 + 16 * n2
    out_x = np.empty(cap, dtype=np.int64)
    out_z = np.empty(cap, dtype=np.int64)
    out_c = np.empty(2 * cap, dtype=np.float64)

    def _ip64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def _ip32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    n_out = lib.nbed_map_terms(
        int(n_modes),
        _ip64(dx), _ip64(dz), _ip64(ax), _ip64(az), _dp(dsc_f), _dp(asc_f),
        n1, _ip32(pq1), _dp(c1f),
        n2, _ip32(pqrs2), _dp(c2f),
        float(tol),
        _ip64(out_x), _ip64(out_z), _dp(out_c),
    )
    coeffs = out_c[: 2 * n_out].view(np.complex128)
    return out_x[:n_out], out_z[:n_out], coeffs


def _pack(mol):
    """Flatten shell tables into the C ABI layout."""
    meta = []
    exps, coefs, c2s = [], [], []
    exp_off = 0
    c2s_off = 0
    for sh in mol.shells:
        meta.append([sh.l, len(sh.exps), sh.atom, sh.ao_offset, exp_off, c2s_off])
        exps.extend(sh.exps)
        coefs.extend(sh.coeffs)
        c2s.extend(np.asarray(sh.cart2sph).ravel().tolist())
        exp_off += len(sh.exps)
        c2s_off += np.asarray(sh.cart2sph).size
    return (
        np.asarray(meta, dtype=np.int32),
        np.asarray(exps), np.asarray(coefs), np.asarray(c2s),
    )


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def one_electron(mol, coords=None):
    """(S, T, V) — V includes the molecule's MM charges when present."""
    lib = _load()
    meta, exps, coefs, c2s = _pack(mol)
    coords = np.ascontiguousarray(
        mol.coords if coords is None else coords, dtype=np.float64
    )
    charges = np.asarray(mol.atom_charges, dtype=np.float64)
    nao = mol.nao
    s = np.zeros((nao, nao))
    t = np.zeros((nao, nao))
    v = np.zeros((nao, nao))
    if mol.mm_coords is not None:
        n_extra = len(mol.mm_charges)
        centers = np.ascontiguousarray(mol.mm_coords, dtype=np.float64)
        q = np.asarray(mol.mm_charges, dtype=np.float64)
        etas = (
            1.0 / np.asarray(mol.mm_radii, dtype=np.float64) ** 2
            if mol.mm_radii is not None else None
        )
    else:
        n_extra, centers, q, etas = 0, np.zeros((1, 3)), np.zeros(1), None
    lib.nbed_one_electron(
        len(mol.shells), meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(exps), _dp(coefs), _dp(c2s), _dp(coords),
        mol.natm, _dp(charges),
        n_extra, _dp(centers), _dp(q),
        _dp(etas) if etas is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_double)),
        _dp(s), _dp(t), _dp(v),
    )
    return s, t, v


def eri_3c(mol, aux, coords=None, omega: float = 0.0):
    """Three-centre DF integrals (ab|P): (nao, nao, naux).

    ``omega > 0`` evaluates the long-range erf(omega*r12)/r12 kernel."""
    lib = _load()
    meta, exps, coefs, c2s = _pack(mol)
    ameta, aexps, acoefs, ac2s = _pack(aux)
    coords = np.ascontiguousarray(
        mol.coords if coords is None else coords, dtype=np.float64
    )
    out = np.zeros((mol.nao, mol.nao, aux.nao))
    lib.nbed_eri_3c(
        len(mol.shells), meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(exps), _dp(coefs), _dp(c2s), _dp(coords),
        len(aux.shells), ameta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(aexps), _dp(acoefs), _dp(ac2s), _dp(out), float(omega),
    )
    return out


def eri_2c(aux, coords=None, omega: float = 0.0):
    """Two-centre Coulomb metric (P|Q): (naux, naux).

    ``omega > 0`` evaluates the long-range erf(omega*r12)/r12 kernel."""
    lib = _load()
    ameta, aexps, acoefs, ac2s = _pack(aux)
    coords = np.ascontiguousarray(
        aux.coords if coords is None else coords, dtype=np.float64
    )
    out = np.zeros((aux.nao, aux.nao))
    lib.nbed_eri_2c(
        len(aux.shells), ameta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(aexps), _dp(acoefs), _dp(ac2s), _dp(coords), _dp(out),
        float(omega),
    )
    return out


def eri(mol, coords=None, omega: float = 0.0):
    """Full (nao, nao, nao, nao) ERI tensor, chemist notation.

    ``omega > 0`` evaluates the long-range erf(omega*r12)/r12 kernel
    (range-separated hybrid exchange)."""
    lib = _load()
    meta, exps, coefs, c2s = _pack(mol)
    coords = np.ascontiguousarray(
        mol.coords if coords is None else coords, dtype=np.float64
    )
    nao = mol.nao
    out = np.zeros((nao, nao, nao, nao))
    lib.nbed_eri(
        len(mol.shells), meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dp(exps), _dp(coefs), _dp(c2s), _dp(coords), _dp(out), float(omega),
    )
    return out
