"""Checkpoint/resume and profiling-hook tests."""

import numpy as np

from nbed_tpu.checkpoint import load_solution, save_solution
from nbed_tpu.profiling import StageTimer


def test_solution_roundtrip(tmp_path, water_uhf, water_uhf_engine):
    path = tmp_path / "scf.npz"
    save_solution(path, water_uhf)
    restored = load_solution(path, water_uhf_engine)
    assert np.allclose(restored.mo_coeff, water_uhf.mo_coeff)
    assert np.isclose(restored.e_tot, water_uhf.e_tot)
    assert restored.converged == water_uhf.converged


def test_warm_restart_converges_fast(water_uhf, water_uhf_engine):
    """Seeding with a converged density should converge in a few cycles."""
    sol = water_uhf_engine.kernel(dm0=water_uhf.make_rdm1(), max_cycle=5)
    assert sol.converged
    assert np.isclose(sol.e_tot, water_uhf.e_tot, atol=1e-8)


def test_stage_timer():
    timer = StageTimer()
    with timer("a"):
        pass
    with timer("a"):
        pass
    with timer("b"):
        pass
    assert set(timer.timings) == {"a", "b"}
    assert timer.timings["a"] >= 0.0
