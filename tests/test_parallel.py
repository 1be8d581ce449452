"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from nbed_tpu.parallel import batched_hf_energies, make_mesh, sharded_scf

pytestmark = [
    pytest.mark.slow,  # compile-heavy; smoke tier = -m 'not slow'
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]


def test_sharded_scf_matches_single_device(water_molecule, water_uhf):
    mesh = make_mesh(8, batch=1)
    res = sharded_scf(water_molecule, mesh, conv_tol=1e-10,
                      dm_conv_tol=1e-8, max_cycle=100)
    e_tot = float(res.e_elec) + float(water_molecule.energy_nuc())
    assert np.isclose(e_tot, water_uhf.e_tot, atol=1e-9)
    assert bool(res.converged)


def test_batched_conformers(water_molecule):
    mesh = make_mesh(8, batch=2)
    base = np.asarray(water_molecule.coords)
    coords = np.repeat(base[None], 4, axis=0)
    coords[:, 2, 2] += np.linspace(0.0, 0.03, 4)
    energies, conv = batched_hf_energies(water_molecule, coords, mesh=mesh,
                                         conv_tol=1e-9, max_cycle=60)
    energies = np.asarray(energies)
    assert np.all(np.asarray(conv))
    # unperturbed geometry reproduces the reference HF oracle
    assert np.isclose(energies[0], -74.96099960129165, atol=1e-6)
    # stretching one O-H bond monotonically raises the energy here
    assert np.all(np.diff(energies) > 0)


def test_batched_gradients(water_molecule):
    from nbed_tpu.parallel import batched_hf_gradients
    from nbed_tpu.solvers.gradients import hf_gradient

    mesh = make_mesh(8, batch=2)
    base = np.asarray(water_molecule.coords)
    coords = np.repeat(base[None], 4, axis=0)
    coords[:, 2, 2] += np.linspace(0.0, 0.03, 4)
    e, grad, conv = batched_hf_gradients(water_molecule, coords, mesh=mesh)
    assert np.all(np.asarray(conv))
    assert np.isclose(float(e[0]), -74.96099960129165, atol=1e-6)
    # every lane matches the single-geometry gradient path
    for b in (0, 3):
        e1, g1, _ = hf_gradient(water_molecule, coords=coords[b])
        assert np.isclose(float(e[b]), float(e1), atol=1e-10)
        assert np.allclose(np.asarray(grad[b]), np.asarray(g1), atol=1e-9)
    # translational invariance per lane
    assert np.max(np.abs(np.asarray(grad).sum(axis=1))) < 1e-9


def test_sharded_df_scf_partitions_and_matches(water_molecule, water_uhf):
    """Aux-sharded density-fitted SCF (the large-molecule multi-chip path):
    per-device B slabs are (n, n, naux_pad / n_model), the compiled program
    joins the partial J/K sums with collectives, and the energy matches the
    single-device DF engine to the DF fitting error."""
    from nbed_tpu.parallel import make_sharded_df_scf

    mesh = make_mesh(8, batch=1)
    fn, args = make_sharded_df_scf(water_molecule, mesh, conv_tol=1e-10,
                                   dm_conv_tol=1e-8, max_cycle=100)
    hcore, s, b = args
    n = water_molecule.nao
    n_model = mesh.shape["model"]
    naux_pad = b.shape[2]
    shard_shapes = {sh.data.shape for sh in b.addressable_shards}
    assert shard_shapes == {(n, n, naux_pad // n_model)}

    compiled = fn.lower(*args).compile()
    hlo = compiled.as_text()
    assert any(tok in hlo for tok in ("all-reduce", "all-gather",
                                      "reduce-scatter", "collective-permute")), \
        "no collectives in the compiled sharded-DF-SCF HLO"

    res = fn(*args)
    e_tot = float(res.e_elec) + float(water_molecule.energy_nuc())
    assert bool(res.converged)
    # DF fitting error bound, same grade as tests/test_df.py (8.4e-6 water)
    assert np.isclose(e_tot, water_uhf.e_tot, atol=2e-5)

    # cross-check against the single-device DF engine: identical fit, so
    # the agreement is much tighter than the DF error itself
    from nbed_tpu.scf.engine import SCFEngine
    eng = SCFEngine(water_molecule, density_fitting=True, conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    e_single = eng.kernel().e_tot
    assert np.isclose(e_tot, e_single, atol=1e-8)


def test_sharded_df_ks_partitions_and_matches(water_molecule, water_uks):
    """Multi-chip UKS: aux-sharded DF J/K composed with grid-point-sharded
    XC. Per-device slabs are (n, n, naux_pad/n_model) and (G_pad/n_model,
    nao); the compiled program joins partial Vxc/J/K sums with collectives;
    the energy matches the single-device DF engine (same fit, same grid)."""
    from nbed_tpu.parallel import make_sharded_df_ks

    mesh = make_mesh(8, batch=1)
    fn, args = make_sharded_df_ks(water_molecule, mesh, xc="b3lyp",
                                  conv_tol=1e-10, dm_conv_tol=1e-8,
                                  max_cycle=100)
    hcore, s, b, ao, ao_grad, weights = args
    n = water_molecule.nao
    n_model = mesh.shape["model"]
    assert {sh.data.shape for sh in b.addressable_shards} \
        == {(n, n, b.shape[2] // n_model)}
    assert {sh.data.shape for sh in ao.addressable_shards} \
        == {(ao.shape[0] // n_model, n)}

    hlo = fn.lower(*args).compile().as_text()
    assert any(tok in hlo for tok in ("all-reduce", "all-gather",
                                      "reduce-scatter", "collective-permute")), \
        "no collectives in the compiled sharded-DF-KS HLO"

    res = fn(*args)
    e_tot = float(res.e_elec) + float(water_molecule.energy_nuc())
    assert bool(res.converged)
    # B3LYP oracle within the DF fitting error
    assert np.isclose(e_tot, water_uks.e_tot, atol=2e-5)

    # identical fit + grid on one device: agreement far below the DF error
    from nbed_tpu.scf.engine import SCFEngine
    eng = SCFEngine(water_molecule, xc="b3lyp", density_fitting=True,
                    conv_tol=1e-10, dm_conv_tol=1e-8, max_cycle=100)
    assert np.isclose(e_tot, eng.kernel().e_tot, atol=1e-8)


def test_sharded_df_ks_rsh_matches_engine(water_molecule):
    """Range-separated hybrid (CAM-B3LYP) on the multi-chip KS path: the
    LR-metric DF factor is aux-sharded alongside the Coulomb-metric one and
    the folded ``hyb*K + beta*K_LR`` exchange reproduces the single-device
    DF engine (same fit, same grid) to well below the DF error."""
    from nbed_tpu.parallel import make_sharded_df_ks
    from nbed_tpu.scf.engine import SCFEngine

    mesh = make_mesh(8, batch=1)
    fn, args = make_sharded_df_ks(water_molecule, mesh, xc="camb3lyp",
                                  conv_tol=1e-10, dm_conv_tol=1e-8,
                                  max_cycle=100)
    hcore, s, b, b_lr, ao, ao_grad, weights = args
    n = water_molecule.nao
    n_model = mesh.shape["model"]
    # both DF factors live aux-sharded on the devices
    assert {sh.data.shape for sh in b_lr.addressable_shards} \
        == {(n, n, b_lr.shape[2] // n_model)}

    res = fn(*args)
    assert bool(res.converged)
    e_tot = float(res.e_elec) + float(water_molecule.energy_nuc())
    eng = SCFEngine(water_molecule, xc="camb3lyp", density_fitting=True,
                    conv_tol=1e-10, dm_conv_tol=1e-8, max_cycle=100)
    assert np.isclose(e_tot, float(eng.kernel().e_tot), atol=1e-8)


def test_jittable_embed_path_rsh(water_molecule):
    """The one-program embedding path with a range-separated environment
    functional: the folded-supermatrix global KS matches the supermatrix
    engine and the subsystem partition identity holds exactly."""
    import jax.numpy as jnp

    from nbed_tpu.parallel import make_mu_embed_energy
    from nbed_tpu.scf.engine import SCFEngine

    fn = make_mu_embed_energy(
        water_molecule, n_active_atoms=1, n_act_mos=4, xc="camb3lyp",
        conv_tol=1e-10, dm_conv_tol=1e-8, max_cycle=100,
    )
    out = fn(jnp.asarray(water_molecule.coords))
    assert bool(out["converged"])
    eng = SCFEngine(water_molecule, xc="camb3lyp", conv_tol=1e-10,
                    dm_conv_tol=1e-8, max_cycle=100)
    assert np.isclose(float(out["e_global"]), float(eng.kernel().e_tot),
                      atol=5e-7)
    assert np.isclose(float(out["e_act"] + out["e_env"] + out["two_e_cross"])
                      + float(water_molecule.energy_nuc()),
                      float(out["e_global"]), atol=1e-9)


def test_jittable_embed_path_matches_driver(water_molecule, mu_driver):
    """The one-program embedding path (global KS -> SPADE -> subsystem
    decomposition -> mu-embedded HF -> assembly) reproduces the host
    driver's mu e_rhf on the same geometry/config."""
    import jax.numpy as jnp

    from nbed_tpu.parallel import make_mu_embed_energy

    inds = mu_driver.localized_system.active_mo_inds
    n_act = len(inds) if inds.ndim == 1 else (len(inds[0]), len(inds[1]))
    fn = make_mu_embed_energy(
        water_molecule, n_active_atoms=1, n_act_mos=n_act, xc="b3lyp",
        conv_tol=1e-10, dm_conv_tol=1e-8, max_cycle=100,
    )
    out = fn(jnp.asarray(water_molecule.coords))
    assert bool(out["converged"])
    assert np.isclose(float(out["e_emb_rhf"]), mu_driver.mu["e_rhf"],
                      atol=5e-6)
    assert np.isclose(float(out["e_global"]),
                      float(mu_driver._global_ks.e_tot), atol=5e-6)
    # internal identities, same as the driver's partition test
    assert np.isclose(float(out["e_act"] + out["e_env"] + out["two_e_cross"])
                      + float(water_molecule.energy_nuc()),
                      float(out["e_global"]), atol=1e-9)


def test_jittable_embed_path_huzinaga(water_molecule, huz_driver):
    """Same program with the Huzinaga projector inside the jitted loop."""
    import jax.numpy as jnp

    from nbed_tpu.parallel import make_mu_embed_energy

    inds = huz_driver.localized_system.active_mo_inds
    n_act = len(inds) if inds.ndim == 1 else (len(inds[0]), len(inds[1]))
    fn = make_mu_embed_energy(
        water_molecule, n_active_atoms=1, n_act_mos=n_act, xc="b3lyp",
        conv_tol=1e-10, dm_conv_tol=1e-8, max_cycle=100,
        projector="huzinaga",
    )
    out = fn(jnp.asarray(water_molecule.coords))
    assert bool(out["converged"])
    assert np.isclose(float(out["e_emb_rhf"]), huz_driver.huzinaga["e_rhf"],
                      atol=5e-6)


def test_batched_embedding_energies(water_molecule, mu_driver):
    """Conformer-fleet embedded-energy scan: one compiled program, batch
    axis sharded over the mesh; the unperturbed lane equals the
    single-geometry program and stretching raises the embedded energy."""
    from nbed_tpu.parallel import (batched_embedding_energies,
                                   make_mu_embed_energy)

    inds = mu_driver.localized_system.active_mo_inds
    n_act = len(inds) if inds.ndim == 1 else (len(inds[0]), len(inds[1]))
    mesh = make_mesh(8, batch=2)
    base = np.asarray(water_molecule.coords)
    coords = np.repeat(base[None], 4, axis=0)
    coords[:, 2, 2] += np.linspace(0.0, 0.05, 4)

    out = batched_embedding_energies(
        water_molecule, coords, n_active_atoms=1, n_act_mos=n_act,
        xc="b3lyp", grid_level=1, mesh=mesh, conv_tol=1e-9,
        dm_conv_tol=1e-7,
    )
    assert np.all(np.asarray(out["converged"]))
    single = make_mu_embed_energy(
        water_molecule, n_active_atoms=1, n_act_mos=n_act, xc="b3lyp",
        grid_level=1, conv_tol=1e-9, dm_conv_tol=1e-7,
    )(coords[0])
    assert np.isclose(float(out["e_emb_rhf"][0]), float(single["e_emb_rhf"]),
                      atol=1e-8)
    assert np.all(np.diff(np.asarray(out["e_global"])) > 0)


def test_mesh_shapes():
    mesh = make_mesh(8, batch=2)
    assert dict(mesh.shape) == {"batch": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(8, batch=3)


def test_sharded_scf_actually_partitions(water_molecule):
    """Prove the distribution, not just the numerics: the ERI slabs live
    row-sharded on the devices and the compiled program communicates via
    collectives (the J/K row-GEMM partial results are combined over the
    'model' axis)."""
    from nbed_tpu.parallel import make_sharded_scf

    mesh = make_mesh(8, batch=1)
    fn, args = make_sharded_scf(water_molecule, mesh, conv_tol=1e-10,
                                dm_conv_tol=1e-8, max_cycle=100)
    hcore, s, eri_j, eri_k = args
    n = water_molecule.nao
    n_model = mesh.shape["model"]
    m_pad = eri_j.shape[0]
    # per-device operand slabs are (M_pad / n_model, n*n)
    for arr in (eri_j, eri_k):
        shard_shapes = {sh.data.shape for sh in arr.addressable_shards}
        assert shard_shapes == {(m_pad // n_model, n * n)}

    compiled = fn.lower(*args).compile()
    hlo = compiled.as_text()
    assert any(tok in hlo for tok in ("all-reduce", "all-gather",
                                      "reduce-scatter", "collective-permute")), \
        "no collectives in the compiled sharded-SCF HLO"

    # and the program still reproduces the single-device result
    res = fn(*args)
    e_tot = float(res.e_elec) + float(water_molecule.energy_nuc())
    assert np.isclose(e_tot, -74.96099960129165, atol=1e-8)
