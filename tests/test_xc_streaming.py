"""Streaming (per-chunk AO recomputation) XC equals the table-based path."""

import numpy as np

from nbed_tpu.scf.engine import SCFEngine

import pytest

pytestmark = pytest.mark.slow  # driver/compile-heavy; smoke tier = -m 'not slow'


def test_streaming_xc_matches_tables(water_molecule, water_uks):
    eng = SCFEngine(water_molecule, xc="b3lyp", conv_tol=1e-9, max_cycle=100)
    eng._XC_TABLE_LIMIT = 0  # force the streaming path
    sol = eng.kernel()
    assert sol.converged
    assert np.isclose(sol.e_tot, water_uks.e_tot, atol=1e-10)
