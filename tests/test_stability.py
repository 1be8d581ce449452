"""SCF stability analysis: A+B orbital-rotation Hessian + mode following.

Physics anchors (no external oracle): equilibrium closed-shell solutions
are stable; H2 stretched past the Coulson-Fischer point has an unstable
spin-restricted solution whose unstable mode, followed downhill, lands on
the broken-symmetry UHF minimum (E below RHF, itself stable, and at large
R approaching two hydrogen atoms).
"""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.ham import HamiltonianBuilder
from nbed_tpu.scf.engine import SCFEngine
from nbed_tpu.solvers import run_stability, stable_scf

pytestmark = pytest.mark.slow  # compile-heavy; smoke tier = -m 'not slow'


def _occ_mask(sol):
    occ = np.asarray(sol.mo_occ)
    if occ.ndim == 1:
        occ = np.stack([occ / 2.0, occ / 2.0])
    k = occ.shape[-1]
    mask = np.zeros(2 * k, dtype=bool)
    mask[::2] = occ[0] > 0
    mask[1::2] = occ[1] > 0
    return mask


def _h2_engine(r_angstrom, **kwargs):
    xyz = f"2\n\nH 0.0 0.0 0.0\nH {r_angstrom} 0.0 0.0"
    mol = build_molecule(xyz, "sto-3g")
    return SCFEngine(mol, conv_tol=1e-12, dm_conv_tol=1e-10,
                     max_cycle=200, **kwargs)


def test_equilibrium_h2_is_stable():
    sol = _h2_engine(0.74).kernel()
    _, h1, h2 = HamiltonianBuilder(sol, 0.0).build()
    stab = run_stability(h1, h2, _occ_mask(sol))
    assert stab.stable and stab.lowest > 0.1


def test_water_uhf_is_stable(water_uhf):
    _, h1, h2 = HamiltonianBuilder(water_uhf, 0.0).build()
    stab = run_stability(h1, h2, _occ_mask(water_uhf))
    assert stab.stable


def test_stretched_h2_instability_followed_to_uhf_minimum():
    engine = _h2_engine(2.5)
    sym = engine.kernel()  # spin-symmetric solution (RHF-like saddle)
    _, h1, h2 = HamiltonianBuilder(sym, 0.0).build()
    stab = run_stability(h1, h2, _occ_mask(sym))
    assert not stab.stable and stab.lowest < -0.05

    bs, stab_bs = stable_scf(engine, sol=sym)
    assert stab_bs.stable
    assert bs.e_tot < sym.e_tot - 0.05
    # at 2.5 A the broken-symmetry minimum is nearly two H atoms
    # (STO-3G H atom: -0.46658 Ha) plus a small residual interaction
    assert abs(bs.e_tot - 2 * (-0.46658185)) < 0.02
    # and it is genuinely spin-broken
    assert bs.spin_square()[0] > 0.5
