"""Embedded-oracle reproducibility floor (quantitative, in-suite).

The reference computed its embedded CCSD/FCI oracle values with the
global KS stopped at convergence=1e-6 (reference tests/conftest.py:79).
The embedding pipeline consumes that density through non-variational
functionals (v_emb, e_env, XC cross), which inherit the stopping residual
FIRST order.  scripts/oracle_floor.py measures the effect: densities a
1e-6 energy-step above the fixed point scatter the embedded FCI by up to
~2.2e-5 Ha (rms 1.4e-5).  This test pins a 2-sample version of that
measurement so the floor claim — and hence the 1e-5 test tolerances in
test_driver.py — stays evidence-backed instead of asserted.
"""

import numpy as np
import pytest
from scipy.linalg import expm

from nbed_tpu.config import NbedConfig
from nbed_tpu.driver import NbedDriver

pytestmark = pytest.mark.slow


def _perturb(sol, rng, scale):
    out = sol.copy()
    c = np.array(out.mo_coeff)
    occ = np.asarray(out.mo_occ)
    for s in range(2):
        no = int(np.sum(occ[s] > 0.5))
        k = rng.standard_normal((no, c[s].shape[1] - no))
        k *= scale / np.linalg.norm(k)
        block = np.zeros((c[s].shape[1],) * 2)
        block[:no, no:] = k
        block[no:, :no] = -k.T
        c[s] = c[s] @ expm(block)
    out.mo_coeff = c
    return out


def _e_tot(sol):
    e_elec, _ = sol.energy_elec()
    return e_elec + sol.energy_nuc()


def test_embedded_fci_inherits_ks_residual_first_order(water_filepath):
    cfg = NbedConfig(
        geometry=str(water_filepath), n_active_atoms=1, basis="STO-3G",
        xc_functional="b3lyp", projector="mu", localization="spade",
        convergence=1e-10, run_fci_emb=True,
    )
    base = NbedDriver(cfg)
    base.embed()
    e_ref = base.mu["e_fci"]
    sol = base._global_ks
    e0 = _e_tot(sol)

    shifts = []
    for seed in (1000, 1001):
        rng = np.random.default_rng(seed)
        # calibrate the occupied-virtual rotation so the KS energy sits
        # ~1e-6 above the fixed point (how an SCF stopped at de<1e-6 sits)
        scale = 1e-3
        for _ in range(8):
            cand = _perturb(sol, np.random.default_rng(seed), scale)
            de = _e_tot(cand) - e0
            if de <= 0:
                scale *= 2.0
                continue
            scale *= float(np.sqrt(1e-6 / de))
            if 5e-7 < de < 2e-6:
                break
        drv = NbedDriver(cfg)
        drv.__dict__["_global_ks"] = cand
        drv.embed()
        shifts.append(drv.mu["e_fci"] - e_ref)

    # first-order inheritance: a de=1e-6 KS stopping residual moves the
    # embedded FCI by well over the 1e-6 target (measured 3.6e-6..2.2e-5
    # across directions, scripts/oracle_floor.py) — the oracle itself is
    # not reproducible beyond ~1e-5
    assert max(abs(s) for s in shifts) > 2e-6
    # ...and stays within the documented floor band
    assert max(abs(s) for s in shifts) < 1e-4
