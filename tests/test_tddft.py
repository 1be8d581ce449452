"""TDA-TDDFT with the autodiff XC kernel (beyond the reference).

Anchors, none needing an external oracle:

1. On a Hartree-Fock engine the TDA response IS CIS — the AO-operator
   route (Fock + J/K supermatrices + no kernel) must reproduce the
   integral-frame CIS spectrum exactly, for the global AND the embedded
   (v_emb-carrying, environment-deleted, non-canonical) solutions.
2. The jvp kernel contraction equals a central finite difference of the
   autodiff vxc along the same AO tangent.
3. Physics: KS TDA spectra are real, ascending, with the usual
   triplet-below-singlet ordering for water's lowest excitation.
"""

import numpy as np
import pytest

from nbed_tpu.driver import run_emb_cis
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.solvers import run_cis, run_tddft_tda, spin_labels

pytestmark = pytest.mark.slow  # session SCF fixtures are compile-heavy


def _interleaved_occ(sol):
    occ = np.asarray(sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])
    k = occ.shape[-1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[::2] = occ[0] > 0
    mask[1::2] = occ[1] > 0
    return mask


def test_tda_on_hf_is_cis(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    cis = run_cis(h1, h2, _interleaved_occ(water_uhf))
    tda = run_tddft_tda(water_uhf)
    assert len(tda.excitations) == len(cis.excitations)
    assert np.allclose(tda.excitations, cis.excitations, atol=1e-8)


def test_tda_on_embedded_hf_is_embedded_cis(mu_driver):
    sol = mu_driver.mu["scf"]
    cis = run_emb_cis(sol)
    tda = run_tddft_tda(sol)
    assert len(tda.excitations) == len(cis.excitations)
    assert np.allclose(tda.excitations, cis.excitations, atol=1e-8)


def test_fxc_jvp_matches_finite_difference(water_molecule):
    import jax
    import jax.numpy as jnp

    from nbed_tpu.scf.engine import SCFEngine

    eng = SCFEngine(water_molecule, xc="b3lyp", conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    sol = eng.kernel()
    dm0 = jnp.asarray(sol.make_rdm1())
    xc_fn = eng.xc_fn

    rng = np.random.default_rng(3)
    t = rng.standard_normal(dm0.shape)
    t = jnp.asarray(0.5 * (t + np.swapaxes(t, -1, -2)))

    _, dv = jax.jvp(lambda d: xc_fn(d)[1], (dm0,), (t,))
    eps = 1e-5
    fd = (np.asarray(xc_fn(dm0 + eps * t)[1])
          - np.asarray(xc_fn(dm0 - eps * t)[1])) / (2 * eps)
    scale = max(np.max(np.abs(fd)), 1e-10)
    assert np.max(np.abs(np.asarray(dv) - fd)) / scale < 1e-5


def test_full_rpa_tddft_on_hf_matches_run_rpa(water_uhf):
    """Cross-module identity: on an HF engine, run_tddft_rpa (AO-operator
    route, +/- density trick) equals run_rpa on the builder integrals."""
    from nbed_tpu.solvers import run_rpa, run_tddft_rpa

    _, h1, h2 = HamiltonianBuilder(water_uhf, 0).build()
    ref = run_rpa(h1, h2, _interleaved_occ(water_uhf))
    got = run_tddft_rpa(water_uhf)
    assert got.n_imaginary == 0
    assert np.allclose(got.excitations, ref.excitations, atol=1e-8)


def test_full_rpa_tddft_ks(water_molecule):
    """KS full-RPA TDDFT: real ascending spectrum below the TDA roots,
    and the polarizability machinery accepts the result."""
    from nbed_tpu.scf.engine import SCFEngine
    from nbed_tpu.solvers import polarizability, run_tddft_rpa

    eng = SCFEngine(water_molecule, xc="b3lyp", conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    sol = eng.kernel()
    rpa = run_tddft_rpa(sol)
    tda = run_tddft_tda(sol)
    assert rpa.n_imaginary == 0
    assert np.all(rpa.excitations > 0.05)
    assert rpa.excitations[0] <= tda.excitations[0] + 1e-12
    # (X+Y)·(X−Y) = 1 normalisation
    ov = np.einsum("rp,rp->r", rpa.amplitudes, rpa.xmy)
    assert np.allclose(ov, 1.0, atol=1e-9)

    alpha = polarizability(sol, rpa)
    assert np.allclose(alpha, alpha.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(alpha) > 0)


def test_fxc_tangent_is_symmetrized(water_molecule):
    """A purely antisymmetric AO tangent leaves the density unchanged, so
    the kernel response must vanish — matvec achieves this by
    symmetrizing the transition density before the jvp (regression: the
    raw tangent injected a spurious ~6e-3 Ha term through _chunk_math's
    symmetric-only grad-rho formula)."""
    import jax
    import jax.numpy as jnp

    from nbed_tpu.scf.engine import SCFEngine

    eng = SCFEngine(water_molecule, xc="b3lyp", conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    sol = eng.kernel()
    dm0 = jnp.asarray(sol.make_rdm1())
    rng = np.random.default_rng(11)
    t = rng.standard_normal(dm0.shape)
    anti = jnp.asarray(0.5 * (t - np.swapaxes(t, -1, -2)))
    sym_part = 0.5 * (anti + jnp.swapaxes(anti, -1, -2))  # == 0
    _, dv = jax.jvp(lambda d: eng.xc_fn(d)[1], (dm0,), (sym_part,))
    assert np.max(np.abs(np.asarray(dv))) < 1e-12


def test_davidson_matches_dense(water_molecule):
    """Matrix-free block Davidson (small max_subspace to force thick
    restarts) reproduces the dense TDA roots to the solver tolerance."""
    from nbed_tpu.scf.engine import SCFEngine

    eng = SCFEngine(water_molecule, xc="b3lyp", conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    sol = eng.kernel()
    dense = run_tddft_tda(sol, nroots=4, method="dense")
    dav = run_tddft_tda(sol, nroots=4, method="davidson", max_subspace=10)
    assert np.allclose(dav.excitations, dense.excitations, atol=1e-7)
    # amplitudes agree up to sign
    ov = np.abs(np.einsum("rp,rp->r", dav.amplitudes, dense.amplitudes))
    assert np.all(ov > 1.0 - 1e-6)


@pytest.mark.parametrize("xc", ["svwn", "b3lyp"])
def test_water_ks_tda_spectrum(water_molecule, xc):
    from nbed_tpu.scf.engine import SCFEngine

    eng = SCFEngine(water_molecule, xc=xc, conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    sol = eng.kernel()
    tda = run_tddft_tda(sol, nroots=6)
    assert np.all(tda.excitations > 0.05)
    assert np.all(np.diff(tda.excitations) >= -1e-12)
    # the kernel matters: this is NOT CIS-on-KS-orbitals
    _, h1, h2 = HamiltonianBuilder(sol, 0).build()
    cis = run_cis(h1, h2, _interleaved_occ(sol), nroots=6)
    assert abs(float(tda.excitations[0] - cis.excitations[0])) > 1e-3
    # water's lowest excitation: triplet below singlet
    labels = spin_labels(sol, tda)
    assert labels[0][0] == "triplet"
    first_singlet = next(i for i, (lab, _) in enumerate(labels)
                         if lab == "singlet")
    assert tda.excitations[first_singlet] > tda.excitations[0]
