"""Two-electron repulsion integrals (chemist notation (ab|cd)).

Shell quartets are canonicalised (a>=b, c>=d, pair(ab)>=pair(cd)) and grouped
into static angular-momentum/contraction classes; one vectorised
McMurchie–Davidson kernel per class is ``vmap``-ped (in memory-bounded
chunks) over the quartet list, and blocks are scattered to all 8 symmetric
positions with precomputed indices.

Replaces the reference's reliance on PySCF ``get_veff``/``ao2mo`` C cores
(SURVEY.md §2.3 row 3). The output tensor feeds MXU-friendly J/K GEMMs in
:mod:`nbed_tpu.scf.jk`.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.molecule import Molecule
from .core import _comp_powers, _e_tables, _sel
from .md import hermite_r_cross

__all__ = ["eri_tensor"]


def _e3(la, lb, a, b, ab_vec):
    pa = _comp_powers(la)
    pb = _comp_powers(lb)
    ex, ey, ez = _e_tables(la, lb, a, b, ab_vec)
    return jnp.einsum(
        "abt,abu,abv->abtuv",
        _sel(ex, pa[0], pb[0]),
        _sel(ey, pa[1], pb[1]),
        _sel(ez, pa[2], pb[2]),
    )


def _eri_prim(la, lb, lc, ld):
    """Primitive cartesian ERI block (nca, ncb, ncc, ncd) for one quartet."""
    lab, lcd = la + lb, lc + ld

    def f(ra, rb, rc, rd, a, b, c, d):
        p = a + b
        q = c + d
        big_p = (a * ra + b * rb) / p
        big_q = (c * rc + d * rd) / q
        alpha = p * q / (p + q)
        e_ab = _e3(la, lb, a, b, ra - rb)  # (nca, ncb, T,T,T)
        e_cd = _e3(lc, ld, c, d, rc - rd)
        r4 = hermite_r_cross(lab, lcd, alpha, big_p - big_q)
        pref = 2.0 * np.pi**2.5 / (p * q * jnp.sqrt(p + q))
        return pref * jnp.einsum("abtuv,tuvxyz,cdxyz->abcd", e_ab, r4, e_cd)

    return f


def _bucket(k: int) -> int:
    """Pad contraction lengths into a small set of buckets: bounds the
    number of static quartet classes to trace/compile (a d-basis molecule
    otherwise generates O(100) classes, each a separate XLA program) while
    keeping the common lengths exact (no padded work for K in 1..4, 6, 9)."""
    for b in (1, 2, 3, 4, 6, 9, 16, 32):
        if k <= b:
            return b
    raise ValueError(f"contraction length {k} too large")


def _padded(arr_list, bucket, fill):
    """Pad list of 1-D arrays to `bucket` length with `fill`."""
    out = np.full((len(arr_list), bucket), fill, dtype=np.float64)
    for i, a in enumerate(arr_list):
        out[i, : len(a)] = a
    return out


class _QuartetTable:
    """Static arrays for one (l, K-bucket) class of canonical quartets.

    Contractions are zero-padded to the bucket length (padded primitives
    carry coefficient 0 and a benign exponent 1), so padding changes cost
    but not results."""

    def __init__(self, key, quartets, shells):
        (self.la, self.lb, self.lc, self.ld), kb = key
        sh = [[shells[i] for i in q] for q in quartets]
        self.atoms = np.array([[s.atom for s in q] for q in sh])  # (M, 4)
        self.exps = [
            _padded([q[k].exps for q in sh], kb[k], 1.0) for k in range(4)
        ]
        self.coefs = [
            _padded([q[k].coeffs for q in sh], kb[k], 0.0) for k in range(4)
        ]
        self.c2s = [np.array([q[k].cart2sph for q in sh]) for k in range(4)]
        ns = [2 * l + 1 for l in (self.la, self.lb, self.lc, self.ld)]
        offs = [np.array([q[k].ao_offset for q in sh]) for k in range(4)]
        m = len(quartets)
        # coordinate grids of the spherical block, offset per quartet
        grids = np.meshgrid(*[np.arange(n) for n in ns], indexing="ij")
        coords = [
            offs[k][:, None, None, None, None] + grids[k][None] for k in range(4)
        ]  # each (M, na, nb, nc, nd)
        # scatter the same value layout to all 8 permutation images
        perms = [
            (0, 1, 2, 3), (1, 0, 2, 3), (0, 1, 3, 2), (1, 0, 3, 2),
            (2, 3, 0, 1), (3, 2, 0, 1), (2, 3, 1, 0), (3, 2, 1, 0),
        ]
        idx = []
        for perm in perms:
            idx.append(tuple(coords[perm.index(k)].reshape(-1) for k in range(4)))
        self.indices = idx  # list of 8 tuples of 4 flat arrays
        self.block_size = int(np.prod(ns))
        self.m = m


def _canonical_quartets(nsh):
    """Canonical (a, b, c, d) with a>=b, c>=d, pair(ab)>=pair(cd)."""
    pairs = [(i, j) for i in range(nsh) for j in range(i + 1)]
    out = []
    for pi in range(len(pairs)):
        for qi in range(pi + 1):
            a, b = pairs[pi]
            c, d = pairs[qi]
            out.append((a, b, c, d))
    return out


@lru_cache(maxsize=32)
def _quartet_tables(mol: Molecule):
    shells = mol.shells
    groups = {}
    for q in _canonical_quartets(len(shells)):
        ls = tuple(shells[i].l for i in q)
        ks = tuple(_bucket(len(shells[i].exps)) for i in q)
        groups.setdefault((ls, ks), []).append(q)
    return [
        _QuartetTable(key, quartets, shells)
        for key, quartets in sorted(groups.items())
    ]


def _chunked_vmap(fn, args, m, chunk):
    """vmap ``fn`` over the leading axis of ``args`` in memory-bounded chunks.

    Full chunks run under one ``lax.map`` (compiled once); the remainder runs
    as a single smaller vmap.
    """
    body = jax.vmap(fn)
    if m <= chunk:
        return body(*args)
    n_full = m // chunk
    stacked = tuple(
        a[: n_full * chunk].reshape((n_full, chunk) + a.shape[1:]) for a in args
    )
    full = jax.lax.map(lambda xs: body(*xs), stacked)
    full = full.reshape((n_full * chunk,) + full.shape[2:])
    if m - n_full * chunk:
        tail = body(*[a[n_full * chunk:] for a in args])
        return jnp.concatenate([full, tail], axis=0)
    return full


def eri_tensor(mol: Molecule, coords=None, chunk: int = 8192):
    """Full AO ERI tensor (nao, nao, nao, nao), chemist notation (ij|kl).

    Pure function of ``coords``; 8-fold permutation symmetry is used to
    compute only canonical quartets. ``chunk`` bounds the vmapped batch to
    keep intermediate Hermite tables within memory.
    """
    c = jnp.asarray(mol.coords) if coords is None else coords
    nao = mol.nao
    out = jnp.zeros((nao, nao, nao, nao))
    for table in _quartet_tables(mol):
        prim = _eri_prim(table.la, table.lb, table.lc, table.ld)

        def quartet_fn(atoms, e0, c0, e1, c1, e2, c2, e3_, c3, s0, s1, s2, s3):
            ra, rb, rc, rd = c[atoms[0]], c[atoms[1]], c[atoms[2]], c[atoms[3]]
            f = jax.vmap(
                lambda ai: jax.vmap(
                    lambda bj: jax.vmap(
                        lambda ck: jax.vmap(
                            lambda dl: prim(ra, rb, rc, rd, ai, bj, ck, dl)
                        )(e3_)
                    )(e2)
                )(e1)
            )(e0)  # (Ka,Kb,Kc,Kd, nca,ncb,ncc,ncd)
            block = jnp.einsum("i,j,k,l,ijklabcd->abcd", c0, c1, c2, c3, f)
            return jnp.einsum("abcd,ap,bq,cr,ds->pqrs", block, s0, s1, s2, s3)

        args = (
            jnp.asarray(table.atoms),
            jnp.asarray(table.exps[0]), jnp.asarray(table.coefs[0]),
            jnp.asarray(table.exps[1]), jnp.asarray(table.coefs[1]),
            jnp.asarray(table.exps[2]), jnp.asarray(table.coefs[2]),
            jnp.asarray(table.exps[3]), jnp.asarray(table.coefs[3]),
            jnp.asarray(table.c2s[0]), jnp.asarray(table.c2s[1]),
            jnp.asarray(table.c2s[2]), jnp.asarray(table.c2s[3]),
        )
        blocks = _chunked_vmap(quartet_fn, args, table.m, chunk)
        vals = blocks.reshape(-1)
        for (ia, ib, ic, id_) in table.indices:
            # .set with duplicate indices is safe: duplicates carry equal values
            out = out.at[jnp.asarray(ia), jnp.asarray(ib),
                         jnp.asarray(ic), jnp.asarray(id_)].set(vals)
    return out
