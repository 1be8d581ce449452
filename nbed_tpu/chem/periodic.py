"""Periodic table lookups (H through Kr)."""

_SYMBOLS = [
    "H", "He",
    "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar",
    "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr",
]

SYMBOL_TO_Z = {s: i + 1 for i, s in enumerate(_SYMBOLS)}
SYMBOL_TO_Z.update({s.upper(): i + 1 for i, s in enumerate(_SYMBOLS)})
Z_TO_SYMBOL = {i + 1: s for i, s in enumerate(_SYMBOLS)}

# Conversion pinned to the value reproducing the reference's nuclear-repulsion
# oracle exactly (tests/test_driver.py:56 in the reference): CODATA-2010 Bohr.
BOHR_IN_ANGSTROM = 0.52917721092
ANGSTROM_TO_BOHR = 1.0 / BOHR_IN_ANGSTROM
