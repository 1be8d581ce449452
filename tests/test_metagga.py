"""Meta-GGA (TPSS) tests: exact-constraint oracles + potential identity.

The reference exposes libxc's functional table through PySCF (any string,
reference nbed/config.py:137 `xc_functional`); this build implements the
functional family directly (SURVEY.md §7 hard part (b)).  With no libxc to
diff against, TPSS is validated by its defining exact constraints — the
published functional was *constructed* from them, so they discriminate the
formula and its fitted constants:

* hydrogen-1s exact exchange: the TPSS `c` constant (1.59096) was fixed so
  that E_x[exact 1s density] = -5/16 Ha exactly (PRL 91, 146401 (2003));
  a wrong constant or a wrong term in x(p, z, alpha) misses at 1e-3 scale,
  the correct form lands at radial-quadrature error (~1e-7).
* one-electron self-interaction-free correlation (z = tau_W/tau = 1).
* uniform-electron-gas limits: exchange -> Slater LDA, correlation ->
  PW92 (through the PBE base).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbed_tpu.dft.functionals import pbe_c, slater_x, tpss_c, tpss_x
from nbed_tpu.dft.xc import make_xc_fn
from nbed_tpu.scf.engine import SCFEngine


def _h1s_radial(n=400, rmax=15.0):
    x, w = np.polynomial.legendre.leggauss(n)
    r = rmax * (x + 1.0) / 2.0
    wr = (rmax / 2.0) * w * 4.0 * np.pi * r**2
    rho = np.exp(-2.0 * r) / np.pi
    return r, wr, rho


def test_tpss_h1s_exact_exchange():
    _, wr, rho = _h1s_radial()
    zero = np.zeros_like(rho)
    # one spin-up electron: sigma_aa = |grad rho|^2 = 4 rho^2, tau = rho/2
    ex = tpss_x(jnp.array(rho), jnp.array(zero), jnp.array(4.0 * rho**2),
                jnp.array(zero), jnp.array(zero), jnp.array(rho / 2.0),
                jnp.array(zero))
    e_x = float(np.sum(wr * np.asarray(ex)))
    assert abs(e_x - (-5.0 / 16.0)) < 1e-6


def test_tpss_one_electron_correlation_vanishes():
    _, wr, rho = _h1s_radial()
    zero = np.zeros_like(rho)
    ec = tpss_c(jnp.array(rho), jnp.array(zero), jnp.array(4.0 * rho**2),
                jnp.array(zero), jnp.array(zero), jnp.array(rho / 2.0),
                jnp.array(zero))
    assert abs(float(np.sum(wr * np.asarray(ec)))) < 1e-10


def test_tpss_uniform_gas_limits():
    ra = jnp.array([0.05, 0.2, 1.0, 4.0])
    rb = 0.7 * ra
    z = jnp.zeros_like(ra)
    # per-spin tau at the uniform limit under exchange spin-scaling:
    # tau_s = tau_unif(2 rho_s) / 2
    tu = lambda r: 0.15 * (3 * np.pi**2) ** (2 / 3) * (2 * r) ** (5 / 3)  # noqa: E731
    ex = tpss_x(ra, rb, z, z, z, tu(ra), tu(rb))
    np.testing.assert_allclose(np.asarray(ex),
                               np.asarray(slater_x(ra, rb, z, z, z)),
                               atol=1e-13)
    ec = tpss_c(ra, rb, z, z, z, tu(ra), tu(rb))
    np.testing.assert_allclose(np.asarray(ec),
                               np.asarray(pbe_c(ra, rb, z, z, z)),
                               atol=1e-13)


def test_tpss_vxc_is_exact_density_matrix_derivative(water_molecule):
    """The assembled V_xc (rho, sigma AND tau channels) must equal the
    autodiff derivative of E_xc with respect to the density matrix — this
    pins the manual tau-term assembly (the 1/2 grad.grad contraction)."""
    eng = SCFEngine(water_molecule, xc="tpss")
    ao, ao_grad = eng._ao_tables
    _, weights = eng._grid
    xc_fn = make_xc_fn(ao, ao_grad, weights, "tpss")

    n = water_molecule.nao
    rng = np.random.default_rng(7)
    a = rng.normal(size=(2, n, n))
    dm = jnp.asarray(0.05 * (a + np.swapaxes(a, 1, 2)) + np.eye(n) * 0.3)

    _, vxc = xc_fn(dm)
    grad = jax.grad(lambda d: xc_fn(d)[0])(dm)
    # dE/dD for symmetric D: autodiff returns the unsymmetrised gradient;
    # V_xc is its symmetric part
    grad_sym = 0.5 * (grad + jnp.swapaxes(grad, 1, 2))
    np.testing.assert_allclose(np.asarray(vxc), np.asarray(grad_sym),
                               atol=1e-10)


@pytest.mark.slow
def test_tpss_scf_water(water_molecule):
    sol = SCFEngine(water_molecule, xc="tpss", conv_tol=1e-9,
                    dm_conv_tol=1e-7, max_cycle=60).kernel()
    assert sol.converged
    # regression pin (this build, Treutler/Lebedev level-3 grid)
    assert np.isclose(sol.e_tot, -75.32293726424629, atol=1e-8)


@pytest.mark.slow
def test_tpss_streaming_xc_matches_tables(water_molecule):
    """The O(chunk*nao)-memory streaming XC path carries the tau channel
    identically to the table path (pfoa-scale molecules use streaming)."""
    # max_memory_mb=0 drives _XC_TABLE_LIMIT to 0, forcing streaming
    eng = SCFEngine(water_molecule, xc="tpss", conv_tol=1e-9,
                    dm_conv_tol=1e-7, max_cycle=60, max_memory_mb=0.0)
    sol = eng.kernel()
    assert sol.converged
    assert np.isclose(sol.e_tot, -75.32293726424629, atol=1e-10)


@pytest.mark.slow
def test_h2_tpss_gradient_matches_finite_difference():
    """Analytic nuclear gradients flow through the tau channel (the grid
    kinetic-energy density depends on coords via the AO gradients)."""
    from nbed_tpu.chem import build_molecule
    from nbed_tpu.solvers.gradients import ks_gradient

    mol = build_molecule("2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.78\n", "sto-3g")
    e, grad, _ = ks_gradient(mol, "tpss", conv_tol=1e-12, dm_conv_tol=1e-10,
                             max_cycle=200)
    step = 2e-4
    coords = np.asarray(mol.coords)
    fd = {}
    for a, k in [(0, 2), (1, 2)]:
        es = []
        for sgn in (+1, -1):
            c = coords.copy()
            c[a, k] += sgn * step
            ep, _, _ = ks_gradient(mol, "tpss", coords=jnp.asarray(c),
                                   conv_tol=1e-12, dm_conv_tol=1e-10,
                                   max_cycle=200)
            es.append(float(ep))
        fd[(a, k)] = (es[0] - es[1]) / (2 * step)
    for a, k in [(0, 2), (1, 2)]:
        assert abs(float(grad[a, k]) - fd[(a, k)]) < 1e-6
    assert np.max(np.abs(np.asarray(grad).sum(axis=0))) < 1e-9


@pytest.mark.slow
def test_tpssh_hybrid_scf_water(water_molecule):
    sol = SCFEngine(water_molecule, xc="tpssh", conv_tol=1e-9,
                    dm_conv_tol=1e-7, max_cycle=60).kernel()
    assert sol.converged
    assert np.isclose(sol.e_tot, -75.32113489427086, atol=1e-8)
