"""Analytic HF nuclear gradients (autodiff) vs central finite differences.

The reference has no gradient capability; this validates the beyond-
reference differentiable-integrals path (solvers/gradients.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.scf.engine import SCFEngine
from nbed_tpu.solvers.gradients import hf_gradient, ks_gradient, optimize_geometry

H2_XYZ = "2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.74\n"


def _fd_gradient(mol, coords, h=1e-4):
    """Central finite differences of the converged HF total energy."""
    coords = np.asarray(coords, dtype=np.float64)
    g = np.zeros_like(coords)
    dm0 = None
    for a in range(coords.shape[0]):
        for k in range(3):
            ep_coords = coords.copy()
            ep_coords[a, k] += h
            ep, _, res = hf_gradient(mol, coords=jnp.asarray(ep_coords), dm0=dm0)
            dm0 = res.dm
            em_coords = coords.copy()
            em_coords[a, k] -= h
            em, _, _ = hf_gradient(mol, coords=jnp.asarray(em_coords), dm0=dm0)
            g[a, k] = (float(ep) - float(em)) / (2 * h)
    return g


def test_h2_gradient_matches_finite_difference():
    mol = build_molecule(H2_XYZ, "sto-3g")
    e, grad, _ = hf_gradient(mol)
    fd = _fd_gradient(mol, mol.coords)
    assert np.allclose(np.asarray(grad), fd, atol=5e-8)
    # translational invariance
    assert np.max(np.abs(np.asarray(grad).sum(axis=0))) < 1e-10
    # stretched H2 at 0.74 A: atoms pull toward each other along z
    assert float(grad[0, 2]) * float(grad[1, 2]) < 0


@pytest.mark.slow
def test_water_gradient_matches_finite_difference():
    xyz = open("tests/molecules/water.xyz").read()
    mol = build_molecule(xyz, "sto-3g")
    e, grad, _ = hf_gradient(mol)
    assert abs(float(e) - (-74.96099960129165)) < 5e-8  # reference UHF oracle
    fd = _fd_gradient(mol, mol.coords)
    assert np.allclose(np.asarray(grad), fd, atol=2e-7)
    assert np.max(np.abs(np.asarray(grad).sum(axis=0))) < 1e-9


def _fd_ks(mol, xc, coords, picks, h=1e-4, **eng):
    """Central differences of the engine KS energy on selected components."""
    coords = np.asarray(coords, dtype=np.float64)
    fd = {}
    for a, k in picks:
        es = []
        for sgn in (+1, -1):
            c = coords.copy()
            c[a, k] += sgn * h
            sol = SCFEngine(
                mol, xc=xc, coords=c, conv_tol=1e-12, dm_conv_tol=1e-10,
                max_cycle=200, **eng
            ).kernel()
            es.append(sol.e_tot)
        fd[(a, k)] = (es[0] - es[1]) / (2 * h)
    return fd


def test_h2_lda_gradient_matches_finite_difference():
    mol = build_molecule(H2_XYZ, "sto-3g")
    e, grad, _ = ks_gradient(mol, "svwn", conv_tol=1e-12, dm_conv_tol=1e-10,
                             max_cycle=200)
    picks = [(0, 2), (1, 2)]
    fd = _fd_ks(mol, "svwn", mol.coords, picks)
    for a, k in picks:
        assert abs(float(grad[a, k]) - fd[(a, k)]) < 1e-6
    assert np.max(np.abs(np.asarray(grad).sum(axis=0))) < 1e-9


@pytest.mark.slow
def test_water_b3lyp_gradient_matches_finite_difference():
    xyz = open("tests/molecules/water.xyz").read()
    mol = build_molecule(xyz, "sto-3g")
    e, grad, _ = ks_gradient(mol, "b3lyp", conv_tol=1e-12, dm_conv_tol=1e-10,
                             max_cycle=200)
    # UKS(B3LYP) oracle (grid-dependent to ~1e-6)
    assert abs(float(e) - (-75.3091447400438)) < 5e-6
    picks = [(0, 2), (1, 1), (2, 0)]
    fd = _fd_ks(mol, "b3lyp", mol.coords, picks)
    for a, k in picks:
        assert abs(float(grad[a, k]) - fd[(a, k)]) < 1e-6
    assert np.max(np.abs(np.asarray(grad).sum(axis=0))) < 1e-8


def test_h2_geometry_optimization():
    mol = build_molecule(H2_XYZ, "sto-3g")
    coords, e, n_steps, ok = optimize_geometry(mol, gtol=5e-5)
    assert ok
    _, grad, _ = hf_gradient(mol, coords=jnp.asarray(coords))
    assert float(jnp.max(jnp.abs(grad))) < 5e-5
    # HF/STO-3G H2 minimum: E = -1.11750588 Ha
    assert abs(e - (-1.1175058843)) < 1e-7
    # optimized energy below the starting point, bond length shortens
    e0, _, _ = hf_gradient(mol)
    assert e < float(e0)
    r = float(np.linalg.norm(coords[1] - coords[0]))
    assert 1.30 < r < 1.40  # HF/STO-3G H2 equilibrium ~1.35 bohr
