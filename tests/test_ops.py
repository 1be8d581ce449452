"""Pallas kernel tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from nbed_tpu.ops import fused_jk

import pytest

pytestmark = pytest.mark.slow  # driver/compile-heavy; smoke tier = -m 'not slow'


def test_fused_jk_matches_reference():
    nao = 12
    m = nao * nao
    rng = np.random.default_rng(7)
    g_j = rng.standard_normal((m, m))
    g_k = rng.standard_normal((m, m))
    dm = rng.standard_normal((2, nao, nao))
    dm = dm + dm.swapaxes(-1, -2)
    j, k = fused_jk(jnp.asarray(g_j), jnp.asarray(g_k), jnp.asarray(dm),
                    tile_m=128, tile_c=128, interpret=True)
    j_ref = (g_j @ (dm[0] + dm[1]).reshape(-1)).reshape(nao, nao)
    k_ref = (g_k @ dm.reshape(2, -1).T).T.reshape(2, nao, nao)
    assert np.allclose(np.asarray(j), j_ref, rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(k), k_ref, rtol=1e-5, atol=1e-4)


def test_pallas_warmup_scf_matches_f64(water_molecule):
    """The fused Pallas J/K kernel wired into the f32 SCF warm-up
    (SCFEngine.pallas_jk) reproduces the plain f64 solve to 1e-8."""
    from nbed_tpu.scf.engine import SCFEngine

    ref = SCFEngine(water_molecule, conv_tol=1e-10, max_cycle=100).kernel()
    pal = SCFEngine(water_molecule, conv_tol=1e-10, max_cycle=100,
                    warmup_f32=True, pallas_jk="on").kernel()
    assert pal.converged
    assert abs(pal.e_tot - ref.e_tot) < 1e-8


def test_incremental_pallas_scf_matches_f64(water_molecule):
    """Incremental mixed-precision SCF with the Pallas kernel as the fast
    J/K path — the exact composition the TPU auto-defaults select — lands
    on the all-f64 fixed point."""
    from nbed_tpu.scf.engine import SCFEngine

    ref = SCFEngine(water_molecule, conv_tol=1e-10, max_cycle=100).kernel()
    inc = SCFEngine(water_molecule, conv_tol=1e-10, max_cycle=100,
                    incremental_jk="on", pallas_jk="on").kernel()
    assert inc.converged
    assert abs(inc.e_tot - ref.e_tot) < 1e-8
