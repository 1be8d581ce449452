"""Gaussian basis-set registry.

Replaces the reference's reliance on PySCF's bundled basis library
(reference driver.py:96-102). Data layout: ``SHELLS = registry[basis][symbol]``
is a list of ``(l, [(exponent, coefficient), ...])`` contracted shells with
*published* contraction coefficients (i.e. coefficients referring to
unit-normalised primitives); normalisation to unit AO norm happens at
molecule-build time in :mod:`nbed_tpu.chem.molecule`.
"""

from .data_sto3g import STO3G
from .data_631g import P631G
from .data_ccpvdz import CCPVDZ, CCPVDZ_GENERATED

_REGISTRY = {
    "sto-3g": STO3G,
    "sto3g": STO3G,
    "6-31g": P631G,
    "631g": P631G,
    "cc-pvdz": CCPVDZ,
    "ccpvdz": CCPVDZ,
}


def available_basis_sets() -> list[str]:
    """Names accepted by :func:`get_element_shells`."""
    return sorted({"sto-3g", "6-31g", "cc-pvdz"})


def get_element_shells(basis: str, symbol: str):
    """Return the contracted shells for ``symbol`` in basis ``basis``.

    ``basis`` may also be a path to a Basis Set Exchange JSON file, which is
    parsed (and cached under its path) on first use — the escape hatch to
    any basis beyond the bundled tables (reference accepts any PySCF-bundled
    basis, driver.py:96-102).

    Raises:
        KeyError: for unknown basis names or unsupported elements.
    """
    key = basis.strip().lower().replace("*", "(d)")
    if key not in _REGISTRY and key.endswith(".json"):
        import os

        if os.path.exists(basis.strip()):
            from .bse import parse_bse_json

            _REGISTRY[key] = parse_bse_json(basis.strip())
    try:
        table = _REGISTRY[key]
    except KeyError as exc:
        raise KeyError(
            f"Basis set '{basis}' not available. Have: {available_basis_sets()} "
            f"(or pass a Basis Set Exchange JSON file path)."
        ) from exc
    sym = symbol.capitalize()
    if table is CCPVDZ and sym in CCPVDZ_GENERATED:
        import warnings

        warnings.warn(
            f"cc-pVDZ entry for {sym} is re-derived by the Dunning "
            "construction rule in this offline image "
            "(scripts/gen_row3_ccpvdz.py), NOT the published "
            "Woon-Dunning table; expect atomic energies 20-60 mHa above "
            "the published set (DZ quality preserved). Pass a Basis Set "
            "Exchange JSON path for the exact published data.",
            stacklevel=3,
        )
    try:
        return table[sym]
    except KeyError as exc:
        raise KeyError(f"Element '{symbol}' not available in basis '{basis}'.") from exc
