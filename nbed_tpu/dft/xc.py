"""Grid XC evaluation: densities, energies, potentials — all on-device.

The potential matrices are derived from the energy-density closure by JAX
autodiff, so every functional in :mod:`nbed_tpu.dft.functionals` gets exact
``vrho``/``vsigma`` for free. The per-iteration cost is a handful of
(G, nao) x (nao, nao) GEMMs — MXU-shaped by construction.
"""

import jax
import jax.numpy as jnp

from .functionals import resolve_functional

__all__ = ["make_xc_fn"]


def make_xc_fn(ao, ao_grad, weights, xc_name: str):
    """Build ``xc_fn(dm) -> (exc, vxc (2, n, n))`` for the SCF engine.

    Args:
        ao: (G, nao) AO values on grid points.
        ao_grad: (3, G, nao) AO gradients.
        weights: (G,) quadrature weights (incl. Becke partition).
        xc_name: functional registry name.

    Returns:
        Callable, or ``None`` for pure HF. The second return of the SCF hook
        contract is the XC potential only (HF exchange is handled by the
        engine via the ``hyb`` fraction from :func:`resolve_functional`).
    """
    terms, _ = resolve_functional(xc_name)
    if not terms:
        return None

    import jax.numpy as _jnp

    # density floor: rho^(-11/3) terms (LYP) overflow f32 below ~1e-6
    thresh = 1e-11 if ao.dtype == _jnp.float64 else 3e-6

    def e_density(ra, rb, gaa, gab, gbb):
        mask = (ra + rb) > thresh
        safe = lambda x: jnp.where(mask, x, 1.0)  # noqa: E731
        out = 0.0
        for coef, fn in terms:
            out = out + coef * fn(safe(ra), safe(rb), safe(gaa), safe(gab), safe(gbb))
        return jnp.where(mask, out, 0.0)

    def total_e(ra, rb, gaa, gab, gbb):
        return jnp.sum(weights * e_density(ra, rb, gaa, gab, gbb))

    grad_e = jax.value_and_grad(total_e, argnums=(0, 1, 2, 3, 4))

    def xc_fn(dm):
        # rho_s(r) and grad rho_s(r) from (G, nao) GEMMs
        ao_d = jnp.einsum("gp,spq->sgq", ao, dm)  # (2, G, nao)
        rho = jnp.einsum("sgq,gq->sg", ao_d, ao)
        grho = 2.0 * jnp.einsum("dgq,sgq->sdg", ao_grad, ao_d)  # (2, 3, G)
        gaa = jnp.einsum("dg,dg->g", grho[0], grho[0])
        gbb = jnp.einsum("dg,dg->g", grho[1], grho[1])
        gab = jnp.einsum("dg,dg->g", grho[0], grho[1])
        exc, (vra, vrb, vgaa, vgab, vgbb) = grad_e(rho[0], rho[1], gaa, gab, gbb)
        # keep the expensive grid GEMMs in the working precision (numpy
        # float64 constants inside functionals otherwise promote under x64)
        dt = ao.dtype
        exc = exc.astype(dt)
        vra, vrb = vra.astype(dt), vrb.astype(dt)
        vgaa, vgab, vgbb = vgaa.astype(dt), vgab.astype(dt), vgbb.astype(dt)
        # gradients already include the quadrature weights (E = sum w*e)
        def vmat(vr, vg_ss, vg_ab, grho_s, grho_t):
            m = jnp.einsum("g,gp,gq->pq", vr, ao, ao)
            vec = 2.0 * vg_ss[None, :] * grho_s + vg_ab[None, :] * grho_t  # (3, G)
            half = jnp.einsum("dg,dgp,gq->pq", vec, ao_grad, ao)
            return m + half + half.T

        va = vmat(vra, vgaa, vgab, grho[0], grho[1])
        vb = vmat(vrb, vgbb, vgab, grho[1], grho[0])
        return exc, jnp.stack([va, vb])

    return xc_fn
