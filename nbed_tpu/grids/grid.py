"""Grid construction and AO evaluation on grid points.

The grid geometry (points, weights) is a pure jittable function of atomic
coordinates with static shapes: per-atom shells are fixed at build time, and
Becke partition weights are computed on-device in memory-bounded chunks.
"""

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.molecule import Molecule, cartesian_components

__all__ = ["MolecularGrid", "build_grid", "eval_aos"]

# Bragg-Slater radii (angstrom -> bohr at use site), H..Ar, for Becke size
# adjustment. Values from Bragg (1920) as used by standard DFT grids.
_BRAGG = {
    1: 0.35, 2: 1.40, 3: 1.45, 4: 1.05, 5: 0.85, 6: 0.70, 7: 0.65, 8: 0.60,
    9: 0.50, 10: 1.50, 11: 1.80, 12: 1.50, 13: 1.25, 14: 1.10, 15: 1.00,
    16: 1.00, 17: 1.00, 18: 1.88,
}
_ANGSTROM_TO_BOHR = 1.0 / 0.52917721092


def _radial_mura_knowles(n: int, alpha: float = 5.0):
    """Mura-Knowles Log3 radial grid: r = -alpha ln(1 - x^3)."""
    i = np.arange(n)
    x = (i + 0.5) / n
    r = -alpha * np.log(1.0 - x**3)
    # dr/dx = alpha * 3x^2/(1-x^3); weight includes r^2 dr
    w = (alpha * 3.0 * x**2 / (1.0 - x**3)) / n * r**2
    return r, w


def _angular_product(n_theta: int):
    """Gauss-Legendre in cos(theta) x uniform azimuth; exact to high degree."""
    xt, wt = np.polynomial.legendre.leggauss(n_theta)
    n_phi = 2 * n_theta
    phi = 2.0 * np.pi * np.arange(n_phi) / n_phi
    wp = 2.0 * np.pi / n_phi
    ct = xt[:, None]
    st = np.sqrt(1.0 - ct**2)
    x = (st * np.cos(phi)[None, :]).ravel()
    y = (st * np.sin(phi)[None, :]).ravel()
    z = np.broadcast_to(ct, (n_theta, n_phi)).ravel()
    w = np.broadcast_to(wt[:, None] * wp, (n_theta, n_phi)).ravel()
    return np.stack([x, y, z], axis=1), w


@dataclass(eq=False)
class MolecularGrid:
    """Static grid metadata; ``points``/``weights`` from :func:`build_grid`."""

    rel_points: np.ndarray  # (G, 3) atom-relative points
    base_weights: np.ndarray  # (G,) radial*angular weights (no partition)
    atom_of_point: np.ndarray  # (G,) owning atom index
    size: int


@lru_cache(maxsize=32)
def _grid_meta(mol: Molecule, n_rad: int, n_theta: int) -> MolecularGrid:
    ang_pts, ang_w = _angular_product(n_theta)
    rel, w, owner = [], [], []
    for ia, z in enumerate(mol.atom_charges):
        alpha = 5.0 if z > 1 else 3.2  # tighter shells for H
        r, wr = _radial_mura_knowles(n_rad, alpha)
        pts = r[:, None, None] * ang_pts[None, :, :]
        ww = wr[:, None] * ang_w[None, :]
        rel.append(pts.reshape(-1, 3))
        w.append(ww.reshape(-1))
        owner.append(np.full(n_rad * len(ang_w), ia))
    rel = np.concatenate(rel)
    return MolecularGrid(
        rel_points=rel,
        base_weights=np.concatenate(w),
        atom_of_point=np.concatenate(owner),
        size=len(rel),
    )


def _becke_weights(points, owner, coords, bragg_radii, chunk=32768):
    """Becke fuzzy-cell partition weights (k=3 smoothing, size adjust).

    Becke, JCP 88, 2547 (1988); size adjustment eq. A2 with Bragg radii.
    """
    natm = coords.shape[0]
    rij = jnp.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    rij = rij + jnp.eye(natm)  # avoid 0 division on diagonal
    chi = bragg_radii[:, None] / bragg_radii[None, :]
    u = (chi - 1.0) / (chi + 1.0)
    a = jnp.clip(u / (u * u - 1.0), -0.5, 0.5)

    def wpart(pts, own):
        d = jnp.linalg.norm(pts[:, None, :] - coords[None, :, :], axis=-1)  # (g,natm)
        mu = (d[:, :, None] - d[:, None, :]) / rij[None, :, :]
        mu = mu + a[None, :, :] * (1.0 - mu * mu)
        f = mu
        for _ in range(3):
            f = 0.5 * f * (3.0 - f * f)
        s = 0.5 * (1.0 - f)
        # product over j != i: set diagonal factors to 1
        s = jnp.where(jnp.eye(natm, dtype=bool)[None, :, :], 1.0, s)
        p = jnp.prod(s, axis=2)  # (g, natm)
        return p[jnp.arange(pts.shape[0]), own] / jnp.sum(p, axis=1)

    g = points.shape[0]
    if g <= chunk:
        return wpart(points, owner)
    n_full = g // chunk
    stacked = (
        points[: n_full * chunk].reshape(n_full, chunk, 3),
        owner[: n_full * chunk].reshape(n_full, chunk),
    )
    full = jax.lax.map(lambda xs: wpart(*xs), stacked).reshape(-1)
    if g - n_full * chunk:
        tail = wpart(points[n_full * chunk:], owner[n_full * chunk:])
        return jnp.concatenate([full, tail])
    return full


def build_grid(mol: Molecule, coords=None, n_rad: int = 80, n_theta: int = 18):
    """Return (points (G,3), weights (G,)) for XC quadrature.

    Pure function of ``coords``: differentiable and vmappable over
    conformers.
    """
    meta = _grid_meta(mol, n_rad, n_theta)
    c = jnp.asarray(mol.coords) if coords is None else coords
    owner = jnp.asarray(meta.atom_of_point)
    points = jnp.asarray(meta.rel_points) + c[owner]
    bragg = jnp.asarray(
        [_BRAGG.get(int(z), 1.5) * _ANGSTROM_TO_BOHR for z in mol.atom_charges]
    )
    becke = _becke_weights(points, owner, c, bragg)
    return points, jnp.asarray(meta.base_weights) * becke


def eval_aos(mol: Molecule, points, coords=None):
    """AO values and gradients on grid points.

    Returns:
        ao: (G, nao); ao_grad: (3, G, nao).
    """
    c = jnp.asarray(mol.coords) if coords is None else coords
    vals, grads = [], []
    for sh in mol.shells:
        center = c[sh.atom]
        rel = points - center[None, :]  # (G, 3)
        r2 = jnp.sum(rel * rel, axis=1)
        exps = jnp.asarray(sh.exps)
        coefs = jnp.asarray(sh.coeffs)
        gauss = coefs[None, :] * jnp.exp(-exps[None, :] * r2[:, None])  # (G, K)
        rad = jnp.sum(gauss, axis=1)
        drad = jnp.sum(-2.0 * exps[None, :] * gauss, axis=1)  # d(rad)/d(r2) * 2 ... see below
        comps = cartesian_components(sh.l)
        mono = []
        dmono = []  # (3, G, ncart)
        for (i, j, k) in comps:
            xm = rel[:, 0] ** i * rel[:, 1] ** j * rel[:, 2] ** k
            mono.append(xm)
            gx = (i * rel[:, 0] ** max(i - 1, 0) * rel[:, 1] ** j * rel[:, 2] ** k
                  if i > 0 else jnp.zeros_like(xm))
            gy = (j * rel[:, 0] ** i * rel[:, 1] ** max(j - 1, 0) * rel[:, 2] ** k
                  if j > 0 else jnp.zeros_like(xm))
            gz = (k * rel[:, 0] ** i * rel[:, 1] ** j * rel[:, 2] ** max(k - 1, 0)
                  if k > 0 else jnp.zeros_like(xm))
            dmono.append(jnp.stack([gx, gy, gz]))
        mono = jnp.stack(mono, axis=1)  # (G, ncart)
        dmono = jnp.stack(dmono, axis=2)  # (3, G, ncart)
        cart_val = mono * rad[:, None]
        # d/dx [mono * rad(r2)] = dmono*rad + mono * drad * d(r2)/dx, d(r2)/dx = 2x
        cart_grad = (
            dmono * rad[None, :, None]
            + mono[None, :, :] * drad[None, :, None] * (rel.T)[:, :, None]
        )
        c2s = jnp.asarray(sh.cart2sph)
        vals.append(cart_val @ c2s)
        grads.append(jnp.einsum("dgc,cs->dgs", cart_grad, c2s))
    return jnp.concatenate(vals, axis=1), jnp.concatenate(grads, axis=2)
