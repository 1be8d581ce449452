"""Hand-written Pallas TPU kernels for the hot compute paths.

The default compute path is plain XLA (which already fuses the ERI-GEMM
Fock builds well); these kernels exist where manual control of the memory
pipeline buys something XLA can't do: the fused J/K build reads each ERI
supermatrix slab from HBM exactly once for all density channels.
"""

from .pallas_jk import fused_jk

__all__ = ["fused_jk"]
