"""Range-separated hybrids: long-range ERIs, ITYH attenuation, CAM-B3LYP.

The reference reaches RSH functionals (CAM-B3LYP, LC-BLYP, ...) through
PySCF's libxc + libcint `with_range_coulomb` machinery (any
`xc_functional` string, reference nbed/config.py:110, driver.py:163-169).
Here both integral engines implement the attenuated Boys transform
F_n(T) -> kappa^(2n+1) F_n(kappa^2 T) and the XC layer implements the
ITYH short-range GGA-exchange attenuation, so the same functionals are
available without libxc/libcint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbed_tpu import native
from nbed_tpu.chem import build_molecule
from nbed_tpu.dft import functionals as F
from nbed_tpu.integrals.eri import eri_tensor
from nbed_tpu.scf.engine import SCFEngine


@pytest.fixture(scope="module")
def water(water_xyz):
    return build_molecule(water_xyz, "sto-3g")


# --------------------------------------------------------------- LR kernels


def test_native_lr_eri_limits(water):
    """omega -> inf recovers the full Coulomb kernel; omega attenuates."""
    g_full = native.eri(water)
    g_inf = native.eri(water, omega=1e6)
    assert np.abs(g_inf - g_full).max() < 1e-9
    g_lr = native.eri(water, omega=0.33)
    # erf(omega r)/r <= 1/r pointwise => diagonal elements shrink
    diag_full = np.einsum("iijj->ij", g_full)
    diag_lr = np.einsum("iijj->ij", g_lr)
    assert (diag_lr <= diag_full + 1e-12).all()
    assert diag_lr.max() < 0.5 * diag_full.max()
    # monotone in omega on the diagonal
    diag_mid = np.einsum("iijj->ij", native.eri(water, omega=0.8))
    assert (diag_lr <= diag_mid + 1e-12).all()


def test_jax_lr_eri_matches_native(water):
    g_n = native.eri(water, omega=0.33)
    g_j = np.asarray(eri_tensor(water, omega=0.33))
    assert np.abs(g_n - g_j).max() < 1e-9


def test_lr_s_quartet_closed_form():
    """Single s-primitive quartet: (ss|ss)_LR = kappa (ss|ss) with
    kappa^2 = omega^2/(rho + omega^2) for concentric unit Gaussians
    (the n=0 attenuated-Boys rule with T=0)."""
    mol = build_molecule("1\n\nH 0.0 0.0 0.0\n", "sto-3g")
    omega = 0.4
    g = native.eri(mol)
    g_lr = native.eri(mol, omega=omega)
    # contracted, so test the *bound*: each primitive term scales by its
    # own kappa < kappa_max; the contracted ratio must lie inside the
    # primitive kappa range
    exps = np.array(mol.shells[0].exps)
    p = exps[:, None] + exps[None, :]
    rho = np.outer(p, p).ravel() / np.add.outer(p.ravel(), p.ravel()).ravel()
    kap = omega / np.sqrt(rho + omega**2)
    ratio = g_lr[0, 0, 0, 0] / g[0, 0, 0, 0]
    assert kap.min() - 1e-12 <= ratio <= kap.max() + 1e-12


# --------------------------------------------------------- ITYH attenuation


def test_ityh_attenuation_branches():
    a = jnp.array(
        [0.0, 1e-8, 0.01, 0.0249, 0.025, 0.0251, 0.5, 2.0, 7.99, 8.0,
         8.01, 50.0, 1e4, 1e10]
    )
    f = np.asarray(F._ityh_attenuation(a))
    df = np.asarray(jax.vmap(jax.grad(F._ityh_attenuation))(a))
    assert not np.isnan(f).any() and not np.isnan(df).any()
    assert f[0] == 1.0
    assert (np.diff(f) < 0).all()  # strictly decreasing
    assert (df[1:] < 0).all()
    # branch continuity
    assert abs(f[3] - f[5]) < 1e-3 and abs(f[8] - f[10]) < 1e-5
    # F(a) -> 1/(36 a^2)
    assert abs(f[11] * 36 * 50.0**2 - 1.0) < 1e-3
    assert abs(f[12] * 36 * 1e8 - 1.0) < 1e-6


def test_ityh_sr_limits_per_point():
    """omega -> 0 keeps the full functional; omega -> inf kills it."""
    pt = tuple(map(jnp.float64, (0.3, 0.3, 1.0, 1.0, 1.0)))
    e_full = float(F.b88_x(*pt))
    e_sr0 = float(F.ityh_sr_x(F.b88_x, 1e-8)(*pt))
    e_srinf = float(F.ityh_sr_x(F.b88_x, 1e6)(*pt))
    assert abs(e_sr0 - e_full) < 1e-6 * abs(e_full)
    assert abs(e_srinf) < 1e-9 * abs(e_full)
    g = jax.grad(lambda *a: F.ityh_sr_x(F.b88_x, 0.33)(*a), argnums=(0, 2))(*pt)
    assert all(np.isfinite(float(x)) for x in g)


# ----------------------------------------------------------------- SCF


@pytest.mark.slow
def test_camb3lyp_scf_water(water):
    sol = SCFEngine(water, xc="camb3lyp").kernel()
    assert bool(sol.converged)
    # regression pin (own value; no external oracle available offline —
    # the omega-limit identities below are the correctness evidence)
    assert abs(float(sol.e_tot) - (-75.27651129206012)) < 1e-8


@pytest.mark.slow
def test_lcblyp_scf_water(water):
    sol = SCFEngine(water, xc="lcblyp").kernel()
    assert bool(sol.converged)
    assert abs(float(sol.e_tot) - (-75.13156528260438)) < 1e-8


@pytest.mark.slow
def test_rsh_omega_inf_equals_global_hybrid(water):
    """omega -> inf: SR exchange vanishes and LR ERIs become full-range,
    so the RSH collapses EXACTLY onto a global hybrid with fraction
    hyb + beta.  Exercises the whole folded-K plumbing end to end."""
    F.FUNCTIONALS["_test_caminf"] = (
        [(0.35, F.b88_x), (0.46, F.ityh_sr_x(F.b88_x, 1e5)),
         (0.19, F.vwn5_c), (0.81, F.lyp_c)],
        0.19,
        (0.46, 1e5),
    )
    F.FUNCTIONALS["_test_caminf_ref"] = (
        [(0.35, F.b88_x), (0.19, F.vwn5_c), (0.81, F.lyp_c)],
        0.65,
    )
    try:
        e_rsh = float(SCFEngine(water, xc="_test_caminf").kernel().e_tot)
        e_ref = float(SCFEngine(water, xc="_test_caminf_ref").kernel().e_tot)
    finally:
        F.FUNCTIONALS.pop("_test_caminf")
        F.FUNCTIONALS.pop("_test_caminf_ref")
    assert abs(e_rsh - e_ref) < 1e-9


@pytest.mark.slow
def test_rsh_omega_zero_equals_low_hybrid(water):
    """omega -> 0: LR exchange vanishes and SR-B88 -> full B88, so
    CAM-B3LYP(omega=1e-5) ~ 0.19 HF + 0.81 B88 + correlation."""
    F.FUNCTIONALS["_test_cam0"] = (
        [(0.35, F.b88_x), (0.46, F.ityh_sr_x(F.b88_x, 1e-5)),
         (0.19, F.vwn5_c), (0.81, F.lyp_c)],
        0.19,
        (0.46, 1e-5),
    )
    F.FUNCTIONALS["_test_cam0_ref"] = (
        [(0.81, F.b88_x), (0.19, F.vwn5_c), (0.81, F.lyp_c)],
        0.19,
    )
    try:
        e_rsh = float(SCFEngine(water, xc="_test_cam0").kernel().e_tot)
        e_ref = float(SCFEngine(water, xc="_test_cam0_ref").kernel().e_tot)
    finally:
        F.FUNCTIONALS.pop("_test_cam0")
        F.FUNCTIONALS.pop("_test_cam0_ref")
    assert abs(e_rsh - e_ref) < 2e-5  # finite-omega residue


@pytest.mark.slow
def test_camb3lyp_df_matches_supermatrix(water):
    e = float(SCFEngine(water, xc="camb3lyp").kernel().e_tot)
    e_df = float(
        SCFEngine(water, xc="camb3lyp", density_fitting=True).kernel().e_tot
    )
    assert abs(e - e_df) < 2e-5  # DF-fit grade (matches test_df bounds)


@pytest.mark.slow
def test_camb3lyp_gradient_matches_fd():
    from nbed_tpu.solvers.gradients import ks_gradient

    mol = build_molecule("2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.80\n", "sto-3g")
    e, grad, _ = ks_gradient(mol, xc="camb3lyp")
    h = 1e-4
    c = np.asarray(mol.coords).copy()

    def e_at(dz):
        cc = c.copy()
        cc[1, 2] += dz
        return float(ks_gradient(mol, xc="camb3lyp", coords=jnp.asarray(cc))[0])

    fd = (e_at(h) - e_at(-h)) / (2 * h)
    assert abs(float(grad[1, 2]) - fd) < 1e-7
    assert np.abs(np.asarray(grad).sum(axis=0)).max() < 1e-10
