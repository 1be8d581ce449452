"""Native C++ integral engine vs the independent JAX implementation."""

import numpy as np
import pytest

from nbed_tpu import native
from nbed_tpu.integrals import (
    eri_tensor,
    kinetic,
    nuclear_attraction,
    overlap,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable")


def test_native_matches_jax_water(water_molecule):
    s, t, v = native.one_electron(water_molecule)
    assert np.allclose(s, np.asarray(overlap(water_molecule)), atol=1e-13)
    assert np.allclose(t, np.asarray(kinetic(water_molecule)), atol=1e-12)
    assert np.allclose(v, np.asarray(nuclear_attraction(water_molecule)), atol=1e-12)
    eri_native = native.eri(water_molecule)
    assert np.allclose(eri_native, np.asarray(eri_tensor(water_molecule)),
                       atol=1e-12)


def test_native_qmmm_point_charges(water_molecule):
    """Point charges enter V identically in both engines."""
    from dataclasses import replace

    from nbed_tpu.integrals import point_charge_attraction

    centers = np.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    charges = np.array([0.5, -0.3])
    mol_mm = replace(water_molecule, mm_coords=centers, mm_charges=charges,
                     mm_radii=None)
    _, _, v_mm = native.one_electron(mol_mm)
    _, _, v_plain = native.one_electron(water_molecule)
    v_jax = np.asarray(point_charge_attraction(water_molecule, centers, charges))
    assert np.allclose(v_mm - v_plain, v_jax, atol=1e-12)


def test_native_qubit_terms_match_python():
    """The C++ term engine reproduces the numpy pipeline exactly (JW and
    BK, complex coefficients included)."""
    import os

    from nbed_tpu.ham.qubit import (
        bravyi_kitaev,
        jordan_wigner,
        parity_transform,
    )

    assert native.qubit_available()
    rng = np.random.default_rng(11)
    n = 8
    h1 = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    h1 = h1 + h1.conj().T
    h2 = rng.normal(size=(n,) * 4) * (rng.random((n,) * 4) < 0.25)
    old = os.environ.get("NBED_TPU_QUBIT")
    try:
        for fn in (jordan_wigner, bravyi_kitaev, parity_transform):
            os.environ["NBED_TPU_QUBIT"] = "python"
            py = fn(0.25, h1, h2)
            os.environ["NBED_TPU_QUBIT"] = "native"
            nat = fn(0.25, h1, h2)
            assert set(py.terms) == set(nat.terms)
            dev = max(abs(py.terms[k] - nat.terms[k]) for k in py.terms)
            assert dev < 1e-12
    finally:
        if old is None:
            os.environ.pop("NBED_TPU_QUBIT", None)
        else:
            os.environ["NBED_TPU_QUBIT"] = old
