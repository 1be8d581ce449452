"""Automatic even-tempered auxiliary basis generation for density fitting.

Builds a per-element even-tempered expansion spanning the product space of
the orbital basis (exponent range [~2*min, ~2*max] per angular momentum,
l up to 2*l_max), the standard auto-aux fallback when no optimised fitting
set is available. Accuracy of DF-SCF with these sets is typically 1e-4 to
1e-5 Ha — an opt-in scalability path, not the parity path.
"""

from dataclasses import replace

import numpy as np

from ..molecule import Molecule, Shell, _normalise_shell

__all__ = ["make_auxiliary_molecule"]


def make_auxiliary_molecule(mol: Molecule, beta: float = 2.0,
                            l_max_factor: int = 2) -> Molecule:
    """Even-tempered auxiliary molecule over the same geometry.

    For each element: per angular momentum l_aux up to
    ``l_max_factor * l_max(element)``, exponents form a geometric series
    with ratio ``beta`` covering [2*zeta_min, 2*zeta_max] of the orbital
    exponents with |l1+l2| compatible angular range.
    """
    # gather orbital exponent ranges per atom
    shells = []
    ao_offset = 0
    for ia in range(mol.natm):
        atom_shells = [s for s in mol.shells if s.atom == ia]
        l_max = max(s.l for s in atom_shells)
        exps_all = np.concatenate([np.asarray(s.exps) for s in atom_shells])
        lo = 2.0 * exps_all.min()
        hi = 2.0 * exps_all.max()
        l_top = min(l_max_factor * l_max + 1, 4)
        for l_aux in range(l_top + 1):
            # taper the high-exponent end for higher aux angular momenta
            hi_l = hi / (beta ** l_aux)
            n_fn = max(1, int(np.ceil(np.log(max(hi_l / lo, 1.0001))
                                      / np.log(beta))) + 1)
            exps = lo * beta ** np.arange(n_fn)
            for a in exps:
                c, c2s = _normalise_shell(l_aux, np.array([a]), np.array([1.0]))
                shells.append(Shell(atom=ia, l=l_aux, exps=(float(a),),
                                    coeffs=tuple(c.tolist()),
                                    ao_offset=ao_offset, cart2sph=c2s))
                ao_offset += 2 * l_aux + 1
    return replace(mol, shells=tuple(shells), basis=f"auto-aux({mol.basis})")
