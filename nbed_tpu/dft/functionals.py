"""Spin-resolved exchange-correlation energy densities (pure jnp).

Each functional maps ``(rho_a, rho_b, gaa, gab, gbb) -> energy / volume``
where ``g__`` are contracted density gradients (sigma variables). Potentials
come from JAX autodiff in :mod:`nbed_tpu.dft.xc`, so these closed forms are
the single source of truth.

Conventions match libxc/PySCF: 'b3lyp' uses the VWN-RPA correlation
parametrisation (as in PySCF >= 2.3, which the reference pins —
reference pyproject requires pyscf >= 2.3); 'b3lyp5' uses VWN5.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["FUNCTIONALS", "resolve_functional"]

_TINY = 1e-12


def _safe(rho):
    return jnp.maximum(rho, _TINY)


# ----------------------------------------------------------------- exchange

def slater_x(ra, rb, gaa, gab, gbb):
    """Slater/Dirac LDA exchange, spin-scaled."""
    cx = (3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * 2.0 ** (1.0 / 3.0)
    return -cx * (_safe(ra) ** (4.0 / 3.0) + _safe(rb) ** (4.0 / 3.0))


def b88_x(ra, rb, gaa, gab, gbb):
    """Becke 1988 exchange (full: LDA part + gradient correction)."""
    beta = 0.0042

    def per_spin(r, g):
        r = _safe(r)
        r43 = r ** (4.0 / 3.0)
        chi = jnp.sqrt(jnp.maximum(g, 0.0)) / r43
        lda = -(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * 2.0 ** (1.0 / 3.0) * r43
        corr = -beta * r43 * chi * chi / (1.0 + 6.0 * beta * chi * jnp.arcsinh(chi))
        return lda + corr

    return per_spin(ra, gaa) + per_spin(rb, gbb)


# -------------------------------------------------------------- correlation

# VWN parameter sets (A, x0, b, c) for paramagnetic / ferromagnetic /
# spin-stiffness fits. VWN5: the "recommended" fits; RPA: the fits libxc
# ships as LDA_C_VWN_RPA (used inside the canonical B3LYP).
_VWN5 = {
    "P": (0.0310907, -0.10498, 3.72744, 12.9352),
    "F": (0.01554535, -0.32500, 7.06042, 18.0578),
    "A": (-1.0 / (6.0 * np.pi**2), -0.00475840, 1.13107, 13.0045),
}
_VWN_RPA = {
    "P": (0.0310907, -0.409286, 13.0720, 42.7198),
    "F": (0.01554535, -0.743294, 20.1231, 101.578),
    "A": (-1.0 / (6.0 * np.pi**2), -0.228344, 1.06835, 11.4813),
}


def _vwn_eps(x, params):
    a, x0, b, c = params
    q = np.sqrt(4.0 * c - b * b)
    xx = x * x + b * x + c
    xx0 = x0 * x0 + b * x0 + c
    atn = jnp.arctan(q / (2.0 * x + b))
    return a * (
        jnp.log(x * x / xx)
        + (2.0 * b / q) * atn
        - (b * x0 / xx0)
        * (jnp.log((x - x0) ** 2 / xx) + (2.0 * (b + 2.0 * x0) / q) * atn)
    )


def _vwn_c(params):
    fpp0 = 8.0 / (9.0 * (2.0 ** (4.0 / 3.0) - 2.0))

    def fn(ra, rb, gaa, gab, gbb):
        rho = _safe(ra + rb)
        zeta = jnp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
        rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
        x = jnp.sqrt(rs)
        eps_p = _vwn_eps(x, params["P"])
        eps_f = _vwn_eps(x, params["F"])
        alpha = _vwn_eps(x, params["A"])
        f_zeta = ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0) / (
            2.0 ** (4.0 / 3.0) - 2.0
        )
        z4 = zeta**4
        eps = eps_p + alpha * (f_zeta / fpp0) * (1.0 - z4) + (eps_f - eps_p) * f_zeta * z4
        return rho * eps

    return fn


vwn5_c = _vwn_c(_VWN5)
vwn_rpa_c = _vwn_c(_VWN_RPA)


def lyp_c(ra, rb, gaa, gab, gbb):
    """Lee-Yang-Parr correlation (Miehlich et al., CPL 157, 200 (1989))."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    cf = 0.3 * (3.0 * np.pi**2) ** (2.0 / 3.0)
    ra = _safe(ra)
    rb = _safe(rb)
    rho = ra + rb
    rm13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + d * rm13
    omega = jnp.exp(-c * rm13) / denom * rho ** (-11.0 / 3.0)
    delta = c * rm13 + d * rm13 / denom
    g_tot = gaa + 2.0 * gab + gbb
    term1 = -4.0 * a / denom * ra * rb / rho
    inner = (
        2.0 ** (11.0 / 3.0) * cf * (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
        + (47.0 / 18.0 - 7.0 * delta / 18.0) * g_tot
        - (5.0 / 2.0 - delta / 18.0) * (gaa + gbb)
        - (delta - 11.0) / 9.0 * (ra * gaa + rb * gbb) / rho
    )
    term2 = -a * b * omega * (
        ra * rb * inner
        - (2.0 / 3.0) * rho**2 * g_tot
        + ((2.0 / 3.0) * rho**2 - ra**2) * gbb
        + ((2.0 / 3.0) * rho**2 - rb**2) * gaa
    )
    return term1 + term2


def _pw92_eps(rs, zeta):
    """Perdew-Wang 1992 LSDA correlation energy per particle."""

    def g(rs, a, a1, b1, b2, b3, b4):
        srs = jnp.sqrt(rs)
        den = 2.0 * a * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
        return -2.0 * a * (1.0 + a1 * rs) * jnp.log(1.0 + 1.0 / den)

    ec0 = g(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
    ec1 = g(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
    alc = -g(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)
    fz = ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0) / (
        2.0 ** (4.0 / 3.0) - 2.0
    )
    fpp0 = 8.0 / (9.0 * (2.0 ** (4.0 / 3.0) - 2.0))
    z4 = zeta**4
    return ec0 + alc * (fz / fpp0) * (1.0 - z4) + (ec1 - ec0) * fz * z4


def pw92_c(ra, rb, gaa, gab, gbb):
    rho = _safe(ra + rb)
    zeta = jnp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    return rho * _pw92_eps(rs, zeta)


def pbe_x(ra, rb, gaa, gab, gbb):
    """PBE exchange (kappa=0.804), spin-scaled."""
    kappa, mu = 0.804, 0.2195149727645171

    def per_spin(r, g):
        r2 = 2.0 * _safe(r)  # spin scaling: Ex[ra,rb] = (Ex[2ra]+Ex[2rb])/2
        kf = (3.0 * np.pi**2 * r2) ** (1.0 / 3.0)
        s2 = 4.0 * jnp.maximum(g, 0.0) / (4.0 * kf * kf * r2 * r2)
        fx = 1.0 + kappa - kappa / (1.0 + mu * s2 / kappa)
        lda = -(3.0 / (4.0 * np.pi)) * kf * r2
        return 0.5 * lda * fx

    return per_spin(ra, gaa) + per_spin(rb, gbb)


def pbe_c(ra, rb, gaa, gab, gbb):
    """PBE correlation (Perdew-Burke-Ernzerhof 1996)."""
    gamma = (1.0 - np.log(2.0)) / np.pi**2
    beta = 0.06672455060314922
    rho = _safe(ra + rb)
    zeta = jnp.clip((ra - rb) / rho, -1.0 + 1e-15, 1.0 - 1e-15)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    eps = _pw92_eps(rs, zeta)
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * np.pi**2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / np.pi)
    gnorm2 = jnp.maximum(gaa + 2.0 * gab + gbb, 0.0)
    t2 = gnorm2 / (2.0 * phi * ks * rho) ** 2
    expo = jnp.exp(-eps / (gamma * phi**3))
    a_coef = (beta / gamma) / jnp.maximum(expo - 1.0, 1e-30)
    num = 1.0 + a_coef * t2
    den = 1.0 + a_coef * t2 + (a_coef * t2) ** 2
    h = gamma * phi**3 * jnp.log(1.0 + (beta / gamma) * t2 * num / den)
    return rho * (eps + h)


# ------------------------------------------------------------------ registry

# name -> (terms [(coef, fn)], hyb fraction of HF exchange)
FUNCTIONALS = {
    "hf": ([], 1.0),
    "lda": ([(1.0, slater_x), (1.0, vwn5_c)], 0.0),
    "svwn": ([(1.0, slater_x), (1.0, vwn5_c)], 0.0),
    "blyp": ([(1.0, b88_x), (1.0, lyp_c)], 0.0),
    # canonical B3LYP: 0.20 HF + 0.08 Slater + 0.72 B88(full) + 0.81 LYP
    # + 0.19 VWN; PySCF>=2.3 'b3lyp' = VWN-RPA, 'b3lyp5' = VWN5.
    "b3lyp": (
        [(0.08, slater_x), (0.72, b88_x), (0.81, lyp_c), (0.19, vwn_rpa_c)],
        0.20,
    ),
    "b3lyp5": (
        [(0.08, slater_x), (0.72, b88_x), (0.81, lyp_c), (0.19, vwn5_c)],
        0.20,
    ),
    "pbe": ([(1.0, pbe_x), (1.0, pbe_c)], 0.0),
    "pbe0": ([(0.75, pbe_x), (1.0, pbe_c)], 0.25),
    "pw92": ([(1.0, slater_x), (1.0, pw92_c)], 0.0),
}


def resolve_functional(name: str):
    """Return (terms, hyb) for a functional name (case-insensitive)."""
    key = name.strip().lower().replace("-", "")
    try:
        return FUNCTIONALS[key]
    except KeyError as exc:
        raise KeyError(
            f"XC functional '{name}' not implemented. Have: {sorted(FUNCTIONALS)}"
        ) from exc
