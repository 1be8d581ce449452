"""Molecule and shell-table construction (host-side, static metadata).

The :class:`Molecule` separates *static* structure (basis layout, angular
momenta, contraction tables, AO offsets — everything that fixes array shapes)
from *dynamic* data (atomic coordinates). Every integral routine downstream
is a pure jittable function of ``coords``, so a conformer batch is just a
``vmap`` over a ``(B, natm, 3)`` array with one compiled executable.

Replaces the reference's ``gto.Mole`` usage (reference driver.py:87-104,
``aoslice_by_atom`` at spade.py:89, electron-count overwrites at
driver.py:262-287).
"""

from dataclasses import dataclass, field, replace

import numpy as np

from .basis import get_element_shells
from .periodic import ANGSTROM_TO_BOHR, SYMBOL_TO_Z

__all__ = ["Shell", "Molecule", "parse_xyz", "build_molecule"]


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def cartesian_components(l: int) -> list[tuple[int, int, int]]:
    """Cartesian monomial powers for angular momentum ``l`` (libcint order)."""
    return [
        (l - i, i - j, j)
        for i in range(l + 1)
        for j in range(i + 1)
    ]


def _solid_harmonic_table(l: int) -> np.ndarray:
    """Real solid harmonics in terms of unnormalised cartesian monomials.

    Returns ``(ncart, nsph)`` with sph columns ordered m = -l..l
    (s; p: m=-1,0,1 -> y,z,x; d: xy, yz, z2, xz, x2-y2; generic fit above).
    Column scale is arbitrary — each AO column is renormalised numerically
    in :func:`_normalise_shell`. l <= 2 uses exact literals; higher l fits
    the (exactly representable) real spherical harmonics on a sphere grid.
    """
    cart = cartesian_components(l)
    idx = {c: i for i, c in enumerate(cart)}
    if l <= 2:
        if l == 0:
            cols = [{(0, 0, 0): 1.0}]
        elif l == 1:
            # m = -1, 0, +1  ->  y, z, x
            cols = [{(0, 1, 0): 1.0}, {(0, 0, 1): 1.0}, {(1, 0, 0): 1.0}]
        else:
            s3 = np.sqrt(3.0)
            cols = [
                {(1, 1, 0): s3},                                     # xy
                {(0, 1, 1): s3},                                     # yz
                {(0, 0, 2): 1.0, (2, 0, 0): -0.5, (0, 2, 0): -0.5},  # 3z^2-r^2
                {(1, 0, 1): s3},                                     # xz
                {(2, 0, 0): s3 / 2, (0, 2, 0): -s3 / 2},
            ]
        out = np.zeros((len(cart), len(cols)))
        for m, col in enumerate(cols):
            for powers, coeff in col.items():
                out[idx[powers], m] = coeff
        return out

    # generic l: least-squares fit of real spherical harmonics (which lie
    # exactly in the span of degree-l monomials on the unit sphere)
    from scipy.special import sph_harm_y

    rng = np.random.default_rng(17)
    pts = rng.standard_normal((max(64, 4 * len(cart) ** 2), 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    theta = np.arccos(np.clip(pts[:, 2], -1, 1))
    phi = np.arctan2(pts[:, 1], pts[:, 0])
    mono = np.stack([
        pts[:, 0] ** i * pts[:, 1] ** j * pts[:, 2] ** k
        for (i, j, k) in cart
    ], axis=1)
    cols = []
    for m in range(-l, l + 1):
        y = sph_harm_y(l, abs(m), theta, phi)
        if m < 0:
            target = np.sqrt(2.0) * (-1.0) ** m * np.imag(y)
        elif m == 0:
            target = np.real(y)
        else:
            target = np.sqrt(2.0) * (-1.0) ** m * np.real(y)
        coef, *_ = np.linalg.lstsq(mono, target, rcond=None)
        coef[np.abs(coef) < 1e-12] = 0.0
        cols.append(coef)
    return np.stack(cols, axis=1)


def _same_center_cart_overlap(powers_a, powers_b, g: float) -> float:
    """<cart_a exp(-a r^2)|cart_b exp(-b r^2)> on one center; g = a + b."""
    val = 1.0
    for pa, pb in zip(powers_a, powers_b):
        n = pa + pb
        if n % 2 == 1:
            return 0.0
        val *= np.sqrt(np.pi / g) * _double_factorial(n - 1) / (2 * g) ** (n // 2)
    return val


def _normalise_shell(l: int, exps: np.ndarray, coeffs: np.ndarray):
    """Fold primitive norms into coefficients and unit-normalise the AOs.

    Returns ``(coeffs, cart2sph)`` such that the contracted spherical AOs
    built from *unnormalised* cartesian primitives
    ``x^i y^j z^k exp(-a r^2)`` have exactly unit self-overlap.
    """
    # published coefficients refer to unit-normalised primitives:
    # N(a) for the (l,0,0) cartesian component.
    norms = np.sqrt(
        (2 * exps / np.pi) ** 1.5 * (4 * exps) ** l / _double_factorial(2 * l - 1)
    )
    c = coeffs * norms
    cart = cartesian_components(l)
    c2s = _solid_harmonic_table(l)
    # contracted same-centre cartesian overlap block, summed over primitives
    ncart = len(cart)
    block = np.zeros((ncart, ncart))
    for i, (ai, ci) in enumerate(zip(exps, c)):
        for j, (aj, cj) in enumerate(zip(exps, c)):
            for p in range(ncart):
                for q in range(ncart):
                    block[p, q] += ci * cj * _same_center_cart_overlap(
                        cart[p], cart[q], ai + aj
                    )
    ao_norm = np.sqrt(np.einsum("pm,pq,qm->m", c2s, block, c2s))
    return c, c2s / ao_norm[None, :]


@dataclass(frozen=True, eq=False)
class Shell:
    """One contracted shell: static metadata for the integral engine."""

    atom: int
    l: int
    exps: tuple
    coeffs: tuple  # primitive-normalised contraction coefficients
    ao_offset: int  # offset into the spherical AO vector
    cart2sph: np.ndarray = field(repr=False, default=None)  # (ncart, nsph), AO-normalising

    @property
    def nsph(self) -> int:
        return 2 * self.l + 1

    @property
    def ncart(self) -> int:
        return (self.l + 1) * (self.l + 2) // 2


@dataclass(frozen=True, eq=False)
class Molecule:
    """Static molecular structure + electron bookkeeping.

    ``coords`` (bohr) is stored as a plain numpy array here; integral
    routines take coordinates explicitly so they stay pure/jittable.
    """

    symbols: tuple
    atom_charges: tuple  # nuclear charges Z
    coords: np.ndarray  # (natm, 3) bohr — default geometry
    basis: str
    shells: tuple
    charge: int = 0
    spin: int = 0  # n_alpha - n_beta
    nelec_override: tuple | None = None  # embedded-subsystem electron counts
    mm_coords: np.ndarray | None = None  # (nmm, 3) bohr
    mm_charges: np.ndarray | None = None
    mm_radii: np.ndarray | None = None

    @property
    def natm(self) -> int:
        return len(self.symbols)

    @property
    def nao(self) -> int:
        last = self.shells[-1]
        return last.ao_offset + last.nsph

    @property
    def nelectron(self) -> int:
        if self.nelec_override is not None:
            return int(sum(self.nelec_override))
        return int(sum(self.atom_charges)) - self.charge

    @property
    def nelec(self) -> tuple:
        """(n_alpha, n_beta)."""
        if self.nelec_override is not None:
            return tuple(int(x) for x in self.nelec_override)
        ne = self.nelectron
        if (ne + self.spin) % 2 != 0:
            raise ValueError(
                f"Electron number {ne} and spin {self.spin} are inconsistent."
            )
        na = (ne + self.spin) // 2
        return (na, ne - na)

    def with_nelec(self, nelec: tuple) -> "Molecule":
        """Copy with overridden electron counts (reference driver.py:262-287)."""
        return replace(self, nelec_override=(int(nelec[0]), int(nelec[1])))

    def aoslice_by_atom(self) -> np.ndarray:
        """(natm, 4): [shell_start, shell_end, ao_start, ao_end] per atom."""
        out = np.zeros((self.natm, 4), dtype=int)
        for ia in range(self.natm):
            sh = [i for i, s in enumerate(self.shells) if s.atom == ia]
            out[ia, 0] = sh[0]
            out[ia, 1] = sh[-1] + 1
            out[ia, 2] = self.shells[sh[0]].ao_offset
            out[ia, 3] = self.shells[sh[-1]].ao_offset + self.shells[sh[-1]].nsph
        return out

    def energy_nuc(self, coords=None) -> float:
        """Nuclear repulsion (+ nuclear–MM interaction when MM present)."""
        import jax.numpy as jnp

        r = self.coords if coords is None else coords
        z = jnp.asarray(self.atom_charges)
        diff = r[:, None, :] - r[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + jnp.eye(self.natm))
        pair = z[:, None] * z[None, :] / dist
        e = 0.5 * jnp.sum(pair * (1.0 - jnp.eye(self.natm)))
        if self.mm_coords is not None:
            dmm = jnp.linalg.norm(
                r[:, None, :] - jnp.asarray(self.mm_coords)[None, :, :], axis=-1
            )
            e = e + jnp.sum(z[:, None] * jnp.asarray(self.mm_charges)[None, :] / dmm)
        return e


def parse_xyz(text: str, unit: str = "angstrom"):
    """Parse an XYZ-format string -> (symbols, coords_bohr)."""
    lines = [ln for ln in text.splitlines()]
    natm = int(lines[0].split()[0])
    atoms = []
    for ln in lines[2 : 2 + natm]:
        parts = ln.split()
        if not parts:
            continue
        atoms.append((parts[0], [float(x) for x in parts[1:4]]))
    symbols = tuple(a[0].capitalize() for a in atoms)
    coords = np.array([a[1] for a in atoms], dtype=np.float64)
    if unit.lower().startswith("a"):
        coords = coords * ANGSTROM_TO_BOHR
    return symbols, coords


def build_molecule(
    geometry: str,
    basis: str,
    charge: int = 0,
    spin: int = 0,
    unit: str = "angstrom",
    mm_coords=None,
    mm_charges=None,
    mm_radii=None,
) -> Molecule:
    """Build a :class:`Molecule` from an XYZ string (reference driver.py:87-104)."""
    symbols, coords = parse_xyz(geometry, unit)
    shells = []
    ao_offset = 0
    for ia, sym in enumerate(symbols):
        for l, prims in get_element_shells(basis, sym):
            exps = np.array([p[0] for p in prims], dtype=np.float64)
            coeffs = np.array([p[1] for p in prims], dtype=np.float64)
            c, c2s = _normalise_shell(l, exps, coeffs)
            shells.append(
                Shell(
                    atom=ia,
                    l=l,
                    exps=tuple(exps.tolist()),
                    coeffs=tuple(c.tolist()),
                    ao_offset=ao_offset,
                    cart2sph=c2s,
                )
            )
            ao_offset += 2 * l + 1
    mmc = None if mm_coords is None else np.asarray(mm_coords, dtype=np.float64) * (
        ANGSTROM_TO_BOHR if unit.lower().startswith("a") else 1.0
    )
    return Molecule(
        symbols=symbols,
        atom_charges=tuple(float(SYMBOL_TO_Z[s]) for s in symbols),
        coords=coords,
        basis=basis,
        shells=tuple(shells),
        charge=charge,
        spin=spin,
        mm_coords=mmc,
        mm_charges=None if mm_charges is None else np.asarray(mm_charges, float),
        mm_radii=None if mm_radii is None else np.asarray(mm_radii, float),
    )
