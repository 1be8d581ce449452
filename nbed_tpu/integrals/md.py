"""McMurchie–Davidson building blocks: Boys function, Hermite E and R tables.

All functions build small fixed-shape jnp expressions for *static* angular
momenta; they are designed to be called inside ``vmap`` over shell pairs or
quartets. References: McMurchie & Davidson, J. Comput. Phys. 26, 218 (1978);
Helgaker/Jorgensen/Olsen ch. 9.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["boys", "e_table_1d", "hermite_r", "hermite_r_cross"]


def boys(mmax: int, t):
    """Boys functions F_0..F_mmax at ``t`` (any shape), stacked on axis 0.

    Computed via the regularised incomplete gamma for F_mmax, then exact
    downward recursion (stable). A Taylor series handles t -> 0.
    """
    t = jnp.asarray(t)
    a = mmax + 0.5
    tsafe = jnp.maximum(t, 1e-30)
    f_big = 0.5 * jnp.exp(jax.lax.lgamma(a)) * jax.lax.igamma(a, tsafe) / tsafe**a
    # series: F_m(t) = sum_k (-t)^k / (k! (2m+2k+1)), accurate for small t
    f_small = jnp.zeros_like(t)
    for k in range(14):
        f_small = f_small + (-t) ** k / (math.factorial(k) * (2 * mmax + 2 * k + 1))
    f_m = jnp.where(t < 1e-1, f_small, f_big)
    out = [None] * (mmax + 1)
    out[mmax] = f_m
    exp_t = jnp.exp(-t)
    for m in range(mmax, 0, -1):
        out[m - 1] = (2 * t * out[m] + exp_t) / (2 * m - 1)
    return jnp.stack(out)


def e_table_1d(la: int, lb: int, a, b, ab_dist):
    """Hermite expansion coefficients E_t^{ij} for one cartesian direction.

    Args:
        la, lb: static maximum powers for centres A and B.
        a, b: primitive exponents (scalars under vmap).
        ab_dist: A_x - B_x.

    Returns:
        (la+1, lb+1, la+lb+1) array; E[i, j, t] with E=0 for t > i+j.
    """
    p = a + b
    mu = a * b / p
    one_over_2p = 0.5 / p
    pa = -b / p * ab_dist  # P - A
    pb = a / p * ab_dist   # P - B

    e = {}
    e[(0, 0, 0)] = jnp.exp(-mu * ab_dist * ab_dist)

    def get(i, j, t):
        if t < 0 or t > i + j or i < 0 or j < 0:
            return 0.0
        return e[(i, j, t)]

    for i in range(la + 1):
        for j in range(lb + 1):
            if i == 0 and j == 0:
                continue
            for t in range(i + j + 1):
                if j == 0:
                    val = (
                        one_over_2p * get(i - 1, j, t - 1)
                        + pa * get(i - 1, j, t)
                        + (t + 1) * get(i - 1, j, t + 1)
                    )
                else:
                    val = (
                        one_over_2p * get(i, j - 1, t - 1)
                        + pb * get(i, j - 1, t)
                        + (t + 1) * get(i, j - 1, t + 1)
                    )
                e[(i, j, t)] = val

    rows = []
    for i in range(la + 1):
        cols = []
        for j in range(lb + 1):
            cols.append(
                jnp.stack([get(i, j, t) + jnp.zeros(()) for t in range(la + lb + 1)])
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def hermite_r(lmax: int, p, pq, omega=None):
    """Hermite Coulomb integrals R_{tuv}(p, PQ) for all t+u+v <= lmax.

    Vectorised downward recursion in the Boys order n: each step builds the
    full (lmax+1)^3 cube for order n from the order-(n+1) cube with three
    shifted-slice updates, so trace size is O(lmax) tensor ops instead of the
    O(lmax^4) unrolled scalar graph of the naive memoised recursion (which
    made d-function quartet classes take minutes to trace).  Entries with
    t+u+v > lmax hold garbage from the truncated recursion but are finite
    and never read by consumers (E-tensor contractions stop at lmax).

    Args:
        lmax: static total Hermite order.
        p: exponent-like prefactor (scalar under vmap).
        pq: 3-vector P - Q (or P - C for nuclear attraction).
        omega: if not None, evaluate over the long-range kernel
            ``erf(omega*r)/r`` instead of ``1/r``: every Boys order is
            attenuated, F_n(T) -> kappa^(2n+1) F_n(kappa^2 T) with
            kappa^2 = omega^2/(p + omega^2) (Helgaker et al. ch. 9;
            the basis of range-separated hybrids such as CAM-B3LYP).

    Returns:
        (lmax+1, lmax+1, lmax+1) array R[t, u, v].
    """
    t_arg = p * jnp.sum(pq * pq)
    if omega is None:
        f = boys(lmax, t_arg)  # (lmax+1,)
    else:
        kappa2 = omega * omega / (p + omega * omega)
        f = boys(lmax, kappa2 * t_arg)
        f = f * jnp.sqrt(kappa2) * kappa2 ** jnp.arange(lmax + 1)
    base = (-2.0 * p) ** jnp.arange(lmax + 1) * f  # R^n_{000}
    size = lmax + 1
    if lmax == 0:
        return base.reshape(1, 1, 1)

    idx = jnp.arange(size)
    tm = idx.reshape(-1, 1, 1)
    um = idx.reshape(1, -1, 1)
    vm = idx.reshape(1, 1, -1)

    def shift(a, axis, k):
        """out[..., i, ...] = a[..., i-k, ...] (zeros shifted in)."""
        pad = [(0, 0)] * 3
        pad[axis] = (k, 0)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, size)
        return jnp.pad(a, pad)[tuple(sl)]

    r = jnp.zeros((size, size, size), base.dtype).at[0, 0, 0].set(base[lmax])
    for n in range(lmax - 1, -1, -1):
        # R^n_{tuv} from R^{n+1} via the first nonzero index (the (t-1)
        # coefficient vanishes exactly where the shifted slice pads zeros)
        cand_t = (tm - 1) * shift(r, 0, 2) + pq[0] * shift(r, 0, 1)
        cand_u = (um - 1) * shift(r, 1, 2) + pq[1] * shift(r, 1, 1)
        cand_v = (vm - 1) * shift(r, 2, 2) + pq[2] * shift(r, 2, 1)
        new = jnp.where(
            tm >= 1, cand_t,
            jnp.where(um >= 1, cand_u, jnp.where(vm >= 1, cand_v, 0.0)),
        )
        r = new.at[0, 0, 0].set(base[n])
    return r


def hermite_r_cross(lab: int, lcd: int, alpha, pq, omega=None):
    """R4[t,u,v,tau,nu,phi] = R_{t+tau, u+nu, v+phi}(alpha, PQ) with signs.

    The (-1)^{tau+nu+phi} factor of the bra-ket Hermite contraction is folded
    in, so the ERI reduces to a plain einsum against the two E tensors.
    ``omega`` selects the long-range erf(omega*r)/r kernel (see hermite_r).
    """
    r = hermite_r(lab + lcd, alpha, pq, omega=omega)
    ts = np.arange(lab + 1)
    taus = np.arange(lcd + 1)
    idx_t = ts[:, None] + taus[None, :]  # (lab+1, lcd+1)
    r4 = r[idx_t[:, None, None, :, None, None],
           idx_t[None, :, None, None, :, None],
           idx_t[None, None, :, None, None, :]]
    sign = (-1.0) ** (taus[:, None, None] + taus[None, :, None] + taus[None, None, :])
    return r4 * sign[None, None, None, :, :, :]
