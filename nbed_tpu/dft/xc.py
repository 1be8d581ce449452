"""Grid XC evaluation: densities, energies, potentials — all on-device.

The potential matrices are derived from the energy-density closure by JAX
autodiff, so every functional in :mod:`nbed_tpu.dft.functionals` gets exact
``vrho``/``vsigma`` for free. The per-iteration cost is a handful of
(G, nao) x (nao, nao) GEMMs — MXU-shaped by construction — evaluated over
grid chunks under ``lax.map`` so peak memory is bounded for large
molecules.
"""

import jax
import jax.numpy as jnp

from .functionals import resolve_functional

__all__ = ["make_xc_fn"]


def make_xc_fn(ao, ao_grad, weights, xc_name: str, chunk: int = 131072):
    """Build ``xc_fn(dm) -> (exc, vxc (2, n, n))`` for the SCF engine.

    Args:
        ao: (G, nao) AO values on grid points.
        ao_grad: (3, G, nao) AO gradients.
        weights: (G,) quadrature weights (incl. Becke partition).
        xc_name: functional registry name.
        chunk: grid points per mapped block (memory bound).

    Returns:
        Callable, or ``None`` for pure HF. HF exchange is handled by the
        engine via the ``hyb`` fraction from :func:`resolve_functional`.
    """
    terms, _ = resolve_functional(xc_name)
    if not terms:
        return None

    # density floor: rho^(-11/3) terms (LYP) overflow f32 below ~1e-6
    thresh = 1e-11 if ao.dtype == jnp.float64 else 3e-6

    def e_density(ra, rb, gaa, gab, gbb):
        mask = (ra + rb) > thresh
        safe = lambda x: jnp.where(mask, x, 1.0)  # noqa: E731
        out = 0.0
        for coef, fn in terms:
            out = out + coef * fn(safe(ra), safe(rb), safe(gaa), safe(gab),
                                  safe(gbb))
        return jnp.where(mask, out, 0.0)

    # zero-pad to whole chunks (zero ao rows -> zero density -> masked out)
    g = ao.shape[0]
    n_chunks = max(1, -(-g // chunk))
    pad = n_chunks * chunk - g
    ao_p = jnp.pad(ao, ((0, pad), (0, 0))).reshape(n_chunks, -1, ao.shape[1])
    grad_p = jnp.pad(ao_grad, ((0, 0), (0, pad), (0, 0)))
    grad_p = grad_p.reshape(3, n_chunks, -1, ao.shape[1]).swapaxes(0, 1)
    w_p = jnp.pad(weights, (0, pad)).reshape(n_chunks, -1)

    def xc_fn(dm):
        def one_chunk(data):
            ao_c, grad_c, w_c = data  # (C,nao), (3,C,nao), (C,)

            def total_e(ra, rb, gaa, gab, gbb):
                return jnp.sum(w_c * e_density(ra, rb, gaa, gab, gbb))

            ao_d = jnp.einsum("gp,spq->sgq", ao_c, dm)  # (2, C, nao)
            rho = jnp.einsum("sgq,gq->sg", ao_d, ao_c)
            grho = 2.0 * jnp.einsum("dgq,sgq->sdg", grad_c, ao_d)  # (2,3,C)
            gaa = jnp.einsum("dg,dg->g", grho[0], grho[0])
            gbb = jnp.einsum("dg,dg->g", grho[1], grho[1])
            gab = jnp.einsum("dg,dg->g", grho[0], grho[1])
            exc, partials = jax.value_and_grad(total_e, argnums=(0, 1, 2, 3, 4))(
                rho[0], rho[1], gaa, gab, gbb
            )
            # keep the expensive grid GEMMs in the working precision (f64
            # numpy constants inside functionals otherwise promote under x64)
            dt = ao_c.dtype
            vra, vrb, vgaa, vgab, vgbb = [p.astype(dt) for p in partials]

            def vmat(vr, vg_ss, vg_ab, grho_s, grho_t):
                m = jnp.einsum("g,gp,gq->pq", vr, ao_c, ao_c)
                vec = 2.0 * vg_ss[None, :] * grho_s + vg_ab[None, :] * grho_t
                half = jnp.einsum("dg,dgp,gq->pq", vec, grad_c, ao_c)
                return m + half + half.T

            va = vmat(vra, vgaa, vgab, grho[0], grho[1])
            vb = vmat(vrb, vgbb, vgab, grho[1], grho[0])
            return exc.astype(dt), jnp.stack([va, vb])

        if n_chunks == 1:
            return one_chunk((ao_p[0], grad_p[0], w_p[0]))
        exc_c, v_c = jax.lax.map(one_chunk, (ao_p, grad_p, w_p))
        return jnp.sum(exc_c), jnp.sum(v_c, axis=0)

    return xc_fn
