"""One-electron integrals: overlap, kinetic, nuclear, point-charge, dipole.

Shell pairs are grouped into static (la, lb, Ka, Kb) classes on the host;
each class runs one vectorised McMurchie–Davidson kernel ``vmap``-ped over
its pair list, then scatters spherical blocks into the AO matrix with
precomputed indices. Everything is a pure function of coordinates.

Replaces PySCF ``intor("int1e_*")`` / ``intor_cross`` usage in the reference
(driver.py:437, huzinaga_scf.py:126, concentric.py:83-89).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.molecule import Molecule, cartesian_components
from .md import e_table_1d, hermite_r

__all__ = [
    "overlap",
    "overlap_cross",
    "kinetic",
    "nuclear_attraction",
    "point_charge_attraction",
    "dipole_integrals",
]


# --------------------------------------------------------------------------
# host-side class tables
# --------------------------------------------------------------------------

def _group_pairs(shells_a, shells_b, symmetric):
    """Yield (key, [(i, j), ...]) grouping pairs by static class."""
    groups = {}
    for i, sa in enumerate(shells_a):
        js = range(i, len(shells_b)) if symmetric else range(len(shells_b))
        for j in js:
            sb = shells_b[j]
            key = (sa.l, sb.l, len(sa.exps), len(sb.exps))
            groups.setdefault(key, []).append((i, j))
    return groups


class _PairTable:
    """Arrays for one (la, lb, Ka, Kb) class of shell pairs."""

    def __init__(self, key, pairs, shells_a, shells_b):
        la, lb, ka, kb = key
        self.la, self.lb = la, lb
        sa = [shells_a[i] for i, _ in pairs]
        sb = [shells_b[j] for _, j in pairs]
        self.atom_a = np.array([s.atom for s in sa])
        self.atom_b = np.array([s.atom for s in sb])
        self.exps_a = np.array([s.exps for s in sa])
        self.coefs_a = np.array([s.coeffs for s in sa])
        self.exps_b = np.array([s.exps for s in sb])
        self.coefs_b = np.array([s.coeffs for s in sb])
        self.c2s_a = np.array([s.cart2sph for s in sa])  # (M, nca, nsa)
        self.c2s_b = np.array([s.cart2sph for s in sb])
        nsa, nsb = 2 * la + 1, 2 * lb + 1
        offs_a = np.array([s.ao_offset for s in sa])
        offs_b = np.array([s.ao_offset for s in sb])
        rows = offs_a[:, None, None] + np.arange(nsa)[None, :, None]
        cols = offs_b[:, None, None] + np.arange(nsb)[None, None, :]
        rows = np.broadcast_to(rows, (len(pairs), nsa, nsb))
        cols = np.broadcast_to(cols, (len(pairs), nsa, nsb))
        self.rows = rows.reshape(-1)
        self.cols = cols.reshape(-1)
        # mirror only blocks of distinct shells: diagonal (i == i) shell
        # blocks already contain both triangles.
        distinct = np.array([i != j for i, j in pairs], dtype=np.float64)
        self.mirror_mask = np.broadcast_to(
            distinct[:, None, None], (len(pairs), nsa, nsb)
        ).reshape(-1)


@lru_cache(maxsize=128)
def _pair_tables(mol_a: Molecule, mol_b: Molecule, symmetric: bool):
    groups = _group_pairs(mol_a.shells, mol_b.shells, symmetric)
    return [
        _PairTable(key, pairs, mol_a.shells, mol_b.shells)
        for key, pairs in sorted(groups.items())
    ]


# --------------------------------------------------------------------------
# per-class primitive kernels (static la, lb; traced scalars under vmap)
# --------------------------------------------------------------------------

def _comp_powers(l):
    comps = cartesian_components(l)
    return (np.array([c[0] for c in comps]),
            np.array([c[1] for c in comps]),
            np.array([c[2] for c in comps]))


def _e_tables(la, lb, a, b, ab_vec, extra_b=0):
    """E tables per cartesian direction, optionally extended in j."""
    return [e_table_1d(la, lb + extra_b, a, b, ab_vec[d]) for d in range(3)]


def _sel(e_dim, ia, jb, t=None):
    """Gather E[i_a, j_b, (t)] for all component pairs -> (nca, ncb, [T])."""
    if t is None:
        return e_dim[ia[:, None], jb[None, :], :]
    return e_dim[ia[:, None], jb[None, :], t]


def _overlap_prim(la, lb):
    pa = _comp_powers(la)
    pb = _comp_powers(lb)

    def f(ra, rb, a, b):
        p = a + b
        ex, ey, ez = _e_tables(la, lb, a, b, ra - rb)
        pref = (np.pi / p) ** 1.5
        return (pref
                * _sel(ex, pa[0], pb[0], 0)
                * _sel(ey, pa[1], pb[1], 0)
                * _sel(ez, pa[2], pb[2], 0))

    return f


def _kinetic_prim(la, lb):
    pa = _comp_powers(la)
    pb = _comp_powers(lb)

    def f(ra, rb, a, b):
        p = a + b
        sq = jnp.sqrt(np.pi / p)
        es = _e_tables(la, lb, a, b, ra - rb, extra_b=2)
        s1 = []  # 1D overlaps (la+1, lb+3)
        for e in es:
            s1.append(e[:, :, 0] * sq)
        t1 = []
        for d, e in enumerate(es):
            j = np.arange(lb + 1)
            s_ij = s1[d][:, : lb + 1]
            s_ijp2 = s1[d][:, 2: lb + 3]
            # s_{i,j-2} with zero padding
            s_ijm2 = jnp.pad(s1[d][:, : max(lb - 1, 0)], ((0, 0), (2, 0)))[:, : lb + 1]
            t1.append(
                b * (2 * j + 1)[None, :] * s_ij
                - 2.0 * b * b * s_ijp2
                - 0.5 * (j * (j - 1))[None, :] * s_ijm2
            )
        sx = s1[0][pa[0][:, None], pb[0][None, :]]
        sy = s1[1][pa[1][:, None], pb[1][None, :]]
        sz = s1[2][pa[2][:, None], pb[2][None, :]]
        tx = t1[0][pa[0][:, None], pb[0][None, :]]
        ty = t1[1][pa[1][:, None], pb[1][None, :]]
        tz = t1[2][pa[2][:, None], pb[2][None, :]]
        return tx * sy * sz + sx * ty * sz + sx * sy * tz

    return f


def _e3_tensor(la, lb, a, b, ab_vec):
    """E3[ca, cb, t, u, v] combined Hermite expansion tensor."""
    pa = _comp_powers(la)
    pb = _comp_powers(lb)
    ex, ey, ez = _e_tables(la, lb, a, b, ab_vec)
    ex_s = _sel(ex, pa[0], pb[0])  # (nca, ncb, T)
    ey_s = _sel(ey, pa[1], pb[1])
    ez_s = _sel(ez, pa[2], pb[2])
    return jnp.einsum("abt,abu,abv->abtuv", ex_s, ey_s, ez_s)


def _nuclear_prim(la, lb):
    lmax = la + lb

    def f(ra, rb, a, b, centers, charges):
        """centers (N,3), charges (N,) -> (nca, ncb)."""
        p = a + b
        big_p = (a * ra + b * rb) / p
        e3 = _e3_tensor(la, lb, a, b, ra - rb)

        def one_center(c, z):
            r = hermite_r(lmax, p, big_p - c)[: lmax + 1, : lmax + 1, : lmax + 1]
            return -z * jnp.einsum("abtuv,tuv->ab", e3, r)

        vals = jax.vmap(one_center)(centers, charges)
        return (2 * np.pi / p) * jnp.sum(vals, axis=0)

    return f


def _smeared_prim(la, lb):
    """Gaussian-smeared charge attraction (QM/MM with radii)."""
    lmax = la + lb

    def f(ra, rb, a, b, centers, charges, etas):
        p = a + b
        big_p = (a * ra + b * rb) / p

        e3 = _e3_tensor(la, lb, a, b, ra - rb)

        def one_center(c, z, eta):
            alpha = p * eta / (p + eta)
            r = hermite_r(lmax, alpha, big_p - c)[: lmax + 1, : lmax + 1, : lmax + 1]
            pref = (2 * np.pi / p) * jnp.sqrt(eta / (p + eta))
            return -z * pref * jnp.einsum("abtuv,tuv->ab", e3, r)

        vals = jax.vmap(one_center)(centers, charges, etas)
        return jnp.sum(vals, axis=0)

    return f


def _dipole_prim(la, lb):
    pa = _comp_powers(la)
    pb = _comp_powers(lb)

    def f(ra, rb, a, b):
        """-> (3, nca, ncb): x, y, z dipole blocks (about the origin)."""
        p = a + b
        sq = jnp.sqrt(np.pi / p)
        es = _e_tables(la, lb, a, b, ra - rb, extra_b=1)
        s1 = [e[:, :, 0] * sq for e in es]  # (la+1, lb+2)
        out = []
        powers = [pa, pb]
        for d in range(3):
            # <i| x_d |j> = s_{i, j+1} + B_d s_{ij}  per dimension d
            dip1 = s1[d][:, 1: lb + 2] + rb[d] * s1[d][:, : lb + 1]
            mats = []
            for dim in range(3):
                ia = powers[0][dim]
                jb = powers[1][dim]
                if dim == d:
                    mats.append(dip1[ia[:, None], jb[None, :]])
                else:
                    mats.append(s1[dim][:, : lb + 1][ia[:, None], jb[None, :]])
            out.append(mats[0] * mats[1] * mats[2])
        return jnp.stack(out)

    return f


# --------------------------------------------------------------------------
# assembly
# --------------------------------------------------------------------------

def _contract_pairs(table: _PairTable, coords_a, coords_b, prim_factory, *extra):
    """vmap a primitive kernel over a pair class, contract primitives,
    transform to spherical. Returns (M, nsa, nsb[, ...leading op axis])."""
    prim = prim_factory(table.la, table.lb)

    def pair_fn(ra, rb, ea, ca, eb, cb, c2sa, c2sb):
        # vmap over primitive products
        fij = jax.vmap(
            lambda ai: jax.vmap(lambda bj: prim(ra, rb, ai, bj, *extra))(eb)
        )(ea)  # (Ka, Kb, [3,] nca, ncb)
        block = jnp.einsum("i,j,ij...->...", ca, cb, fij)
        # cart -> sph on the last two axes
        return jnp.einsum("...ab,ap,bq->...pq", block, c2sa, c2sb)

    return jax.vmap(pair_fn)(
        coords_a[table.atom_a],
        coords_b[table.atom_b],
        jnp.asarray(table.exps_a),
        jnp.asarray(table.coefs_a),
        jnp.asarray(table.exps_b),
        jnp.asarray(table.coefs_b),
        jnp.asarray(table.c2s_a),
        jnp.asarray(table.c2s_b),
    )


def _assemble(mol_a, mol_b, coords_a, coords_b, prim_factory, symmetric,
              op_shape=(), extra=()):
    nao_a, nao_b = mol_a.nao, mol_b.nao
    out = jnp.zeros(op_shape + (nao_a, nao_b))
    for table in _pair_tables(mol_a, mol_b, symmetric):
        blocks = _contract_pairs(table, coords_a, coords_b, prim_factory, *extra)
        # blocks: (M, *op_shape, nsa, nsb); move op axes front
        mask = jnp.asarray(table.mirror_mask)
        if op_shape:
            blocks = jnp.moveaxis(blocks, 1, 0)  # assume single op axis
            vals = blocks.reshape(op_shape + (-1,))
            out = out.at[..., table.rows, table.cols].add(vals)
            if symmetric:
                out = out.at[..., table.cols, table.rows].add(vals * mask)
        else:
            vals = blocks.reshape(-1)
            out = out.at[table.rows, table.cols].add(vals)
            if symmetric:
                out = out.at[table.cols, table.rows].add(vals * mask)
    return out


def _coords(mol, coords):
    return jnp.asarray(mol.coords) if coords is None else coords


def overlap(mol: Molecule, coords=None):
    """AO overlap matrix S (nao, nao)."""
    c = _coords(mol, coords)
    return _assemble(mol, mol, c, c, _overlap_prim, symmetric=True)


def overlap_cross(mol_a: Molecule, mol_b: Molecule, coords_a=None, coords_b=None):
    """Cross-basis overlap <a|b> (nao_a, nao_b) — used by concentric
    localization (reference concentric.py:83-89)."""
    return _assemble(
        mol_a, mol_b, _coords(mol_a, coords_a), _coords(mol_b, coords_b),
        _overlap_prim, symmetric=False,
    )


def kinetic(mol: Molecule, coords=None):
    """Kinetic-energy matrix T (nao, nao)."""
    c = _coords(mol, coords)
    return _assemble(mol, mol, c, c, _kinetic_prim, symmetric=True)


def nuclear_attraction(mol: Molecule, coords=None):
    """Nuclear-attraction matrix V (nao, nao) over the molecule's nuclei."""
    c = _coords(mol, coords)
    z = jnp.asarray(mol.atom_charges)
    return _assemble(mol, mol, c, c, _nuclear_prim, symmetric=True, extra=(c, z))


def point_charge_attraction(mol: Molecule, centers, charges, radii=None, coords=None):
    """External point/gaussian charge attraction added to hcore for QM/MM.

    With ``radii`` given, charges are smeared gaussians with exponent
    1/r**2 (reference uses pyscf ``qmmm.mm_charge``, driver.py:171-180).
    """
    c = _coords(mol, coords)
    centers = jnp.asarray(centers)
    charges = jnp.asarray(charges, dtype=jnp.float64)
    if radii is None:
        return _assemble(mol, mol, c, c, _nuclear_prim, symmetric=True,
                         extra=(centers, charges))
    etas = 1.0 / (jnp.asarray(radii, dtype=jnp.float64) ** 2)
    return _assemble(mol, mol, c, c, _smeared_prim, symmetric=True,
                     extra=(centers, charges, etas))


def dipole_integrals(mol: Molecule, coords=None):
    """Dipole (position-operator) matrices about the origin: (3, nao, nao)."""
    c = _coords(mol, coords)
    return _assemble(mol, mol, c, c, _dipole_prim, symmetric=True, op_shape=(3,))
