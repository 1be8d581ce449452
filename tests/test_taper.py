"""Z2 qubit-tapering tests (nbed_tpu.ham.taper).

The reference has no tapering (its publication pipeline exports to an
external SDK for symmetry reduction); these tests validate the built-in
implementation against exact spectra: the tapered Hamiltonian's ground
energy in the HF-determined sector must equal the untapered one, and every
reported symmetry must commute with every term.
"""

import numpy as np
import pytest

from nbed_tpu.ham import (
    HamiltonianBuilder,
    PauliSum,
    find_z2_symmetries,
    jordan_wigner,
    pauli_ground_state,
    reduce_virtuals,
    taper,
    taper_auto,
)
from nbed_tpu.ham.qubit import _popcount


def _commutes(sym, x, z):
    return not ((_popcount(x & sym.z) ^ _popcount(z & sym.x)) & 1)


def _hf_bits(scf_solution):
    occ = np.asarray(scf_solution.mo_occ)
    bits = 0
    for p in np.nonzero(occ[0] > 0)[0]:
        bits |= 1 << (2 * int(p))
    for p in np.nonzero(occ[1] > 0)[0]:
        bits |= 1 << (2 * int(p) + 1)
    return bits


def test_toy_z_symmetry_exact_split():
    """H = Z0Z1 + 0.3 X0X1 + 0.2 Z0 has exactly one symmetry (tau = ZZ);
    tapering to 1 qubit must reproduce both sectors of the exact
    2-qubit spectrum."""
    ps = PauliSum(2)
    ps.add(1.0, 0, 0b11)  # Z0 Z1
    ps.add(0.3, 0b11, 0)  # X0 X1
    ps.add(0.2, 0, 0b01)  # Z0
    syms = find_z2_symmetries(ps)
    assert len(syms) == 1
    s = syms[0]
    assert (s.x, s.z) == (0, 0b11)  # the ZZ parity
    full = np.sort(np.linalg.eigvalsh(_dense(ps)))
    halves = []
    for eig in (+1, -1):
        tp = taper(ps, syms, [eig])
        assert tp.n_qubits == 1
        halves.append(np.linalg.eigvalsh(_dense(tp)))
    assert np.allclose(np.sort(np.concatenate(halves)), full, atol=1e-12)


def test_x_type_symmetry_sector_scan():
    """An Ising chain in a transverse field has the global-X-parity
    symmetry; hf_bits gives no analytic sector for an X-type tau, so
    taper_auto must scan sectors and land on the true ground energy."""
    n = 4
    ps = PauliSum(n)
    for q in range(n - 1):
        ps.add(-1.0, 0, 0b11 << q)  # -Z_q Z_{q+1}
    for q in range(n):
        ps.add(-0.7, 1 << q, 0)  # -0.7 X_q
    syms = find_z2_symmetries(ps)
    assert len(syms) == 1
    assert syms[0].z == 0 and syms[0].x == (1 << n) - 1  # X X X X
    e_full = float(np.linalg.eigvalsh(_dense(ps))[0])
    tp, syms2, sector = taper_auto(ps, hf_bits=0)
    assert len(syms2) == 1 and tp.n_qubits == n - 1
    e_tap = float(np.linalg.eigvalsh(_dense(tp))[0])
    assert np.isclose(e_tap, e_full, atol=1e-10)


def test_degenerate_kernel_stays_abelian():
    """H = Z0Z1 + 0.3 X0X1: the commutant contains both ZZ and XX (they
    commute, but single-qubit sigmas collide at shared qubits).  The
    selector must still return a valid abelian tapering set and the sector
    union must tile the full spectrum."""
    ps = PauliSum(2)
    ps.add(1.0, 0, 0b11)
    ps.add(0.3, 0b11, 0)
    syms = find_z2_symmetries(ps)
    assert len(syms) == 2  # ZZ (sigma X0) and XX (sigma Z1)
    full = np.sort(np.linalg.eigvalsh(_dense(ps)))
    parts = []
    for code in range(4):
        sector = [1 - 2 * (code & 1), 1 - 2 * ((code >> 1) & 1)]
        tp = taper(ps, syms, sector)
        assert tp.n_qubits == 0
        parts.append(float(np.real(sum(tp.terms.values()))))
    assert np.allclose(np.sort(parts), full, atol=1e-12)


def _dense(ps: PauliSum):
    from nbed_tpu.ham import pauli_sum_to_sparse

    return pauli_sum_to_sparse(ps).toarray()


@pytest.mark.slow
def test_water_taper_preserves_ground_state(water_uhf):
    """Full water/STO-3G: 14 -> 10 qubits, FCI ground energy exact, and the
    HF-bits sector matches the scan-free analytic selection."""
    const, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    ps = jordan_wigner(const, h1, h2)
    assert ps.n_qubits == 14
    syms = find_z2_symmetries(ps)
    # alpha/beta parities + 2 point-group symmetries for C2v water
    assert len(syms) == 4
    for s in syms:
        assert s.x == 0  # JW molecular symmetries are Z strings
        assert all(_commutes(s, x, z) for (x, z) in ps.terms)
    tp, _, sector = taper_auto(ps, hf_bits=_hf_bits(water_uhf))
    assert tp.n_qubits == 10
    e_full = pauli_ground_state(ps)[0]
    e_tap = pauli_ground_state(tp)[0]
    assert np.isclose(e_tap, e_full, atol=1e-9)


@pytest.mark.slow
def test_reduced_water_taper_all_sectors_union(water_uhf):
    """On a reduced register the union of all sector spectra must equal the
    full spectrum (exact block-diagonalisation check)."""
    reduced = reduce_virtuals(water_uhf, 4)  # 6 qubits
    const, h1, h2 = HamiltonianBuilder(reduced, 0).build()
    ps = jordan_wigner(const, h1, h2)
    syms = find_z2_symmetries(ps)
    assert syms
    full = np.sort(np.linalg.eigvalsh(_dense(ps)))
    parts = []
    for code in range(1 << len(syms)):
        sector = [1 - 2 * ((code >> i) & 1) for i in range(len(syms))]
        parts.append(np.linalg.eigvalsh(_dense(taper(ps, syms, sector))))
    assert np.allclose(np.sort(np.concatenate(parts)), full, atol=1e-9)


@pytest.mark.slow
def test_driver_taper_flag(water_xyz):
    """taper_qubits=True records a tapered block whose ground energy equals
    the embedded FCI electronic energy."""
    from nbed_tpu import nbed

    driver = nbed(
        geometry=water_xyz,
        n_active_atoms=1,
        basis="STO-3G",
        xc_functional="b3lyp",
        projector="mu",
        localization="spade",
        convergence=1e-8,
        run_fci_emb=True,
        taper_qubits=True,
    )
    blk = driver.mu["tapered"]
    assert blk["n_qubits"] < blk["n_qubits_raw"]
    e0 = float(pauli_ground_state(blk["psum"])[0])
    # ground energy of the full (untapered) embedded Hamiltonian
    e_raw = float(pauli_ground_state(
        jordan_wigner(*driver.mu["second_quantised"]))[0])
    assert np.isclose(e0, e_raw, atol=1e-8)


def test_driver_taper_parity_mapping(water_xyz):
    """qubit_mapping='parity': the tapered block is built from the parity
    encoding (whose single-qubit Z_{n-1} number-parity symmetry is one of
    the removed generators) and preserves the ground energy."""
    from nbed_tpu import nbed

    driver = nbed(
        geometry=water_xyz,
        n_active_atoms=1,
        basis="STO-3G",
        xc_functional="b3lyp",
        projector="mu",
        localization="spade",
        convergence=1e-8,
        taper_qubits=True,
        qubit_mapping="parity",
    )
    blk = driver.mu["tapered"]
    assert blk["n_qubits"] < blk["n_qubits_raw"]
    e0 = float(pauli_ground_state(blk["psum"])[0])
    e_raw = float(pauli_ground_state(
        jordan_wigner(*driver.mu["second_quantised"]))[0])
    assert np.isclose(e0, e_raw, atol=1e-8)
