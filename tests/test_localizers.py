"""Localizer tests (reference tests/test_localizers.py) on water/6-31G."""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.localizers import (
    ACELocalizer,
    BOYSLocalizer,
    ConcentricLocalizer,
    IBOLocalizer,
    OccupiedLocalizer,
    PAOLocalizer,
    PMLocalizer,
    SPADELocalizer,
    check_values,
)
from nbed_tpu.scf.engine import SCFEngine

pytestmark = pytest.mark.slow  # driver/compile-heavy; smoke tier = -m 'not slow'

N_ACTIVE = 1


@pytest.fixture(scope="module")
def water631g(water_xyz):
    return build_molecule(water_xyz, "6-31g")


@pytest.fixture(scope="module")
def global_rks(water631g):
    return SCFEngine(water631g, xc="b3lyp", restricted=True, conv_tol=1e-9,
                     max_cycle=100).kernel()


@pytest.fixture(scope="module")
def global_uks(water631g):
    return SCFEngine(water631g, xc="b3lyp", conv_tol=1e-9, max_cycle=100).kernel()


def test_spade_env_span_complete_when_fragment_small():
    """When n_active_aos < n_occ the environment span lives in the
    orthogonal complement of the thin SVD's right-singular space; a
    full_matrices=False SVD silently truncated c_enviro (found on pfoa:
    tr(D_env S) was 7 instead of 87). Acetonitrile with a 1-atom fragment
    (5 active AOs, 11 occupied) exercises the regime."""
    from pathlib import Path

    xyz = (Path(__file__).parent / "molecules" / "acetonitrile.xyz").read_text()
    mol = build_molecule(xyz, "sto-3g")
    sol = SCFEngine(mol, conv_tol=1e-8, max_cycle=100).kernel()
    loc = SPADELocalizer(sol, 1).localize()
    n_occ = mol.nelec[0]
    assert loc.c_loc_occ.shape[-1] == n_occ
    s = np.asarray(sol.engine.s)
    n_act = loc.c_active.shape[-1]
    assert loc.c_enviro.shape[-1] == n_occ - n_act
    # env orbitals are orthonormal and the partition preserves the density
    g = loc.c_enviro[0].T @ s @ loc.c_enviro[0]
    assert np.allclose(g, np.eye(n_occ - n_act), atol=1e-8)
    dm_tot = loc.dm_active + loc.dm_enviro
    dm_ref = sol.make_rdm1()
    assert np.allclose(dm_tot, dm_ref, atol=1e-8)


def test_base_localizer_is_abstract(global_rks):
    with pytest.raises(TypeError):
        OccupiedLocalizer(global_rks, N_ACTIVE)


def test_pm_threshold_validation(global_rks):
    with pytest.raises(ValueError):
        PMLocalizer(global_rks, N_ACTIVE, occ_cutoff=1.5)
    with pytest.raises(ValueError):
        PMLocalizer(global_rks, N_ACTIVE, occ_cutoff=0.9, virt_cutoff=-0.1)


def test_check_values_passes(global_rks, global_uks):
    for scf in (global_rks, global_uks):
        loc = SPADELocalizer(scf, N_ACTIVE).localize()
        check_values(loc, scf)


def test_spade_restricted_matches_unrestricted(global_rks, global_uks):
    """Reference tests/test_localizers.py:~200-214."""
    restricted = SPADELocalizer(global_rks, N_ACTIVE).localize()
    unrestricted = SPADELocalizer(global_uks, N_ACTIVE).localize()
    assert restricted.active_mo_inds.ndim == 1
    assert np.all(unrestricted.active_mo_inds[0] == unrestricted.active_mo_inds[1])
    assert np.all(restricted.active_mo_inds == unrestricted.active_mo_inds[0])


def test_pm_restricted_matches_unrestricted(global_rks, global_uks):
    restricted = PMLocalizer(global_rks, N_ACTIVE).localize()
    unrestricted = PMLocalizer(global_uks, N_ACTIVE).localize()
    assert np.all(restricted.active_mo_inds == unrestricted.active_mo_inds[0])
    assert np.all(unrestricted.active_mo_inds[0] == unrestricted.active_mo_inds[1])


def test_cl_shell_numbers(global_rks, global_uks):
    """CL shell sizes [12, 13] (reference tests/test_localizers.py:238)."""
    SPADELocalizer(global_rks, N_ACTIVE).localize()
    restricted_virt = ConcentricLocalizer(global_rks.copy(), N_ACTIVE)
    restricted_virt.localize_virtual()

    SPADELocalizer(global_uks, N_ACTIVE).localize()
    unrestricted_virt = ConcentricLocalizer(global_uks.copy(), N_ACTIVE)
    unrestricted_virt.localize_virtual()

    assert restricted_virt.shells == [12, 13]
    assert (restricted_virt.shells == unrestricted_virt.shells[0]
            == unrestricted_virt.shells[1])


def test_pao_localizer(global_rks):
    """PAOs span the virtual space: orthogonal to the localized occupieds."""
    loc = SPADELocalizer(global_rks, N_ACTIVE).localize()
    pao = PAOLocalizer(global_rks, N_ACTIVE, loc.c_loc_occ)
    virts = pao.localize_virtual()
    assert virts.shape[-1] > 0
    s = np.asarray(global_rks.engine.s)
    overlap_occ = np.abs(loc.c_loc_occ.T @ s @ virts).max()
    assert overlap_occ < 1e-10


def test_boys_and_ibo_localize(global_rks):
    """Boys/IBO runs produce valid partitions (sense checks pass)."""
    for cls in (BOYSLocalizer, IBOLocalizer):
        loc = cls(global_rks, N_ACTIVE).localize()
        check_values(loc, global_rks)


def test_ace_localizer(global_rks, global_uks):
    """ACE-of-SPADE returns (3, 3) (reference tests/test_localizers.py:271)."""
    restricted = ACELocalizer([global_rks] * 3, N_ACTIVE).localize_path()
    unrestricted = ACELocalizer([global_uks] * 3, N_ACTIVE).localize_path()
    assert restricted == unrestricted == (3, 3)

    spade = SPADELocalizer(global_rks, N_ACTIVE, n_mo_overwrite=restricted)
    spade.localize()
    gaps = (spade.enviro_selection_condition[0][:-1]
            - spade.enviro_selection_condition[0][1:])
    assert restricted[0] - 1 == np.argmax(gaps)
