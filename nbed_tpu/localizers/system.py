"""Localized-system data contract (reference localizers/system.py:8-36)."""

from dataclasses import dataclass, field

import numpy as np

__all__ = ["LocalizedSystem"]


@dataclass
class LocalizedSystem:
    """Active/environment partition of the occupied space.

    Arrays are spinless (n, k) for restricted inputs or stacked (2, n, k)
    for unrestricted; density matrices are derived as C C^T in
    ``__post_init__`` (the restricted caller doubles them, reference
    occupied/base.py:84-85).
    """

    active_mo_inds: np.ndarray
    enviro_mo_inds: np.ndarray
    c_active: np.ndarray
    c_enviro: np.ndarray
    c_loc_occ: np.ndarray
    c_loc_virt: np.ndarray | None = None
    dm_active: np.ndarray = field(init=False)
    dm_enviro: np.ndarray = field(init=False)
    dm_loc_occ: np.ndarray = field(init=False)

    def __post_init__(self):
        self.dm_active = self.c_active @ self.c_active.swapaxes(-1, -2)
        self.dm_enviro = self.c_enviro @ self.c_enviro.swapaxes(-1, -2)
        self.dm_loc_occ = self.c_loc_occ @ self.c_loc_occ.swapaxes(-1, -2)
