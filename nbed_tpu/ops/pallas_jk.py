"""Fused J/K Fock-build kernel (Pallas TPU).

Computes, in one pass over HBM:

    J   = G_J @ d_tot          (Coulomb supermatrix (ij|kl))
    K_s = G_K @ d_s, s=a,b     (exchange supermatrix (ik|jl))

Each grid step streams one (TM, TC) tile of each supermatrix through VMEM
and accumulates the three matvec partials; the density tiles are tiny and
stay resident. Compared with separate XLA matvecs this halves HBM traffic
for the exchange channel (both spins share each G_K tile read) and keeps
the J/K pair in a single kernel launch.

TPU Mosaic does not support f64, so this is an *opt-in fast path* in f32
(useful for early SCF iterations / mixed-precision schemes); the default
engine path stays in f64 XLA GEMMs. Kernel layout follows the grid/BlockSpec
patterns of the Pallas TPU guide.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_jk"]


def _kernel(gj_ref, gk_ref, d_ref, out_ref):
    """Grid: (rows, cols). Accumulate out tiles over the column dimension."""
    j_col = pl.program_id(1)

    @pl.when(j_col == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gj = gj_ref[:]  # (TM, TC)
    gk = gk_ref[:]  # (TM, TC)
    d = d_ref[:]    # (3, TC): d_tot, d_alpha, d_beta
    jt = jnp.dot(gj, d[0:1].T, preferred_element_type=jnp.float32)  # (TM, 1)
    kt = jnp.dot(gk, d[1:3].T, preferred_element_type=jnp.float32)  # (TM, 2)
    out_ref[:] += jnp.concatenate([jt, kt], axis=1).T  # (3, TM)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_c", "interpret"))
def fused_jk(g_j, g_k, dm, tile_m: int = 256, tile_c: int = 512,
             interpret: bool = False):
    """Fused Coulomb/exchange build.

    Args:
        g_j: (M, M) Coulomb supermatrix, M = nao^2 (padded to tile multiples
            by this function).
        g_k: (M, M) exchange supermatrix.
        dm: (2, nao, nao) spin densities.
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        (j, k): j (nao, nao); k (2, nao, nao) — float32.
    """
    nao = dm.shape[-1]
    m = g_j.shape[0]
    tile_m = min(tile_m, m)
    tile_c = min(tile_c, m)
    pad_m = (-m) % tile_m
    pad_c = (-m) % tile_c
    gj = jnp.pad(g_j.astype(jnp.float32), ((0, pad_m), (0, pad_c)))
    gk = jnp.pad(g_k.astype(jnp.float32), ((0, pad_m), (0, pad_c)))
    d = jnp.stack([
        (dm[0] + dm[1]).reshape(-1),
        dm[0].reshape(-1),
        dm[1].reshape(-1),
    ]).astype(jnp.float32)
    d = jnp.pad(d, ((0, 0), (0, pad_c)))

    mp = m + pad_m
    mc = m + pad_c
    grid = (mp // tile_m, mc // tile_c)
    # index maps cast to int32: Mosaic rejects the i64 indices that
    # jax_enable_x64 would otherwise produce.
    i32 = jnp.int32
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_c), lambda i, j: (i32(i), i32(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_c), lambda i, j: (i32(i), i32(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_c), lambda i, j: (i32(0), i32(j)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile_m), lambda i, j: (i32(0), i32(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, mp), jnp.float32),
        interpret=interpret,
    )(gj, gk, d)
    j = out[0, :m].reshape(nao, nao)
    k = out[1:, :m].reshape(2, nao, nao)
    return j, k
