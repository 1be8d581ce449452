"""Exchange-correlation functionals evaluated on molecular grids.

Self-contained replacement for the reference's libxc dependency (via PySCF
``dft.UKS``, reference driver.py:163-169): spin-resolved LDA (Slater, VWN-RPA,
VWN5), GGA (B88, LYP, PBE) energy densities written as pure jnp functions,
with potentials obtained by JAX autodiff — one definition per functional,
derivatives exact by construction.
"""

from .functionals import FUNCTIONALS, resolve_functional
from .xc import make_xc_fn, make_xc_fn_streaming

__all__ = ["FUNCTIONALS", "resolve_functional", "make_xc_fn",
           "make_xc_fn_streaming"]
