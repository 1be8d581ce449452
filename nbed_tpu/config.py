"""Configuration model, enums and parsing helpers.

Schema-compatible with the reference config (reference nbed/config.py:79-145)
so existing JSON config files are drop-in: same field names, defaults,
validation behaviour (``extra="forbid"``, XYZ regex + file-path coercion).
"""

import json
import logging
import os
from enum import Enum
from pathlib import Path
from typing import Annotated, Any, Literal

from pydantic import (
    BaseModel,
    BeforeValidator,
    ConfigDict,
    Field,
    FilePath,
    NonNegativeInt,
    PositiveFloat,
    PositiveInt,
    TypeAdapter,
    field_validator,
)

logger = logging.getLogger(__name__)


class ProjectorTypes(Enum):
    """Implemented projection operators (reference config.py:25-30)."""

    MU = "mu"
    HUZ = "huzinaga"
    BOTH = "both"


class OccupiedLocalizerTypes(Enum):
    """Implemented occupied-orbital localizers (reference config.py:33-39)."""

    SPADE = "spade"
    BOYS = "boys"
    IBO = "ibo"
    PM = "pm"


class VirtualLocalizerTypes(Enum):
    """Implemented virtual-orbital localizers (reference config.py:42-47)."""

    CONCENTRIC = "cl"
    PROJECTED_AO = "pao"
    DISABLE = "disable"


XYZGeometry = Annotated[
    str, Field(pattern="^\\d+\n\\s?\n(?:\\w(?:\\s+\\-?\\d\\.\\d+){3}\n?)*")
]


def validate_xyz_file(maybe_xyz: Any) -> str:
    """Coerce a path to an XYZ file into its contents; pass raw strings through.

    Mirrors reference config.py:55-76 behaviour: an existing path is read and
    validated as XYZ text; a non-existent path string is returned unchanged so
    the geometry regex produces the validation error.
    """
    match maybe_xyz:
        case str() | Path():
            if os.path.exists(maybe_xyz):
                with open(maybe_xyz) as file:
                    content = file.read()
                TypeAdapter(XYZGeometry).validate_strings(content)
                return content
            return str(maybe_xyz)
        case _:
            return maybe_xyz


class NbedConfig(BaseModel):
    """Validated run configuration.

    Field-for-field compatible with the reference model
    (reference config.py:106-145). See that file's docstring for semantics.
    """

    model_config = ConfigDict(extra="forbid")

    geometry: Annotated[XYZGeometry, BeforeValidator(validate_xyz_file)]
    n_active_atoms: PositiveInt
    basis: str
    xc_functional: str
    projector: ProjectorTypes = Field(default=ProjectorTypes.MU)
    localization: OccupiedLocalizerTypes = Field(default=OccupiedLocalizerTypes.SPADE)
    convergence: PositiveFloat = 1e-6
    charge: NonNegativeInt = Field(default=0)
    spin: NonNegativeInt = Field(default=0)
    unit: str = "angstrom"
    # accepted for schema compatibility; only the default (False) is
    # supported — see the validator below.  The reference forwards this to
    # gto.Mole (reference driver.py:96-104); point-group symmetry adds no
    # leverage to the dense TPU kernels, so True is REJECTED rather than
    # silently ignored.
    symmetry: bool = False

    savefile: FilePath | None = None

    run_ccsd_emb: bool = False
    run_fci_emb: bool = False
    run_dft_in_dft: bool = False
    # extension beyond the reference (which exports the Hamiltonian to an
    # external SDK for this): solve the embedded Hamiltonian with the
    # built-in UCCSD VQE (solvers/vqe.py) and record e_vqe in the result
    run_vqe_emb: bool = False
    # extension beyond the reference: CIS/TDA excited states of the
    # embedded active region (solvers/cis.py) — the number of excitation
    # roots to record under result["cis"] (0 = off)
    run_cis_emb: NonNegativeInt = 0
    # extension beyond the reference: full RPA/TDHF excited states of the
    # embedded active region (solvers/cis.run_rpa) — roots recorded under
    # result["rpa"] (0 = off)
    run_rpa_emb: NonNegativeInt = 0

    mm_coords: list | None = None
    mm_charges: list | None = None
    mm_radii: list | None = None

    mu_level_shift: PositiveFloat = 1e6
    init_huzinaga_rhf_with_mu: bool = False

    virtual_localization: VirtualLocalizerTypes = Field(
        default=VirtualLocalizerTypes.CONCENTRIC
    )
    n_mo_overwrite: tuple[None | NonNegativeInt, None | NonNegativeInt] = (None, None)
    occupied_threshold: float = Field(default=0.95, gt=0, lt=1)
    virtual_threshold: float = Field(default=0.95, gt=0, lt=1)
    max_shells: PositiveInt = 4
    norm_cutoff: PositiveFloat = 0.05
    overlap_cutoff: PositiveFloat = 1e-5

    force_unrestricted: bool = False

    # nbed_tpu extensions (absent from reference configs)
    # density_fitting: None = auto (DF above the driver's nao threshold)
    density_fitting: bool | None = None
    warmup_f32: bool = False
    # Z2-symmetry qubit tapering of the embedded Hamiltonian (ham/taper.py):
    # records the Pauli sum, its symmetries, sector and the tapered sum
    # under result["tapered"] — qubit counts below the raw register.
    taper_qubits: bool = False
    # fermion-to-qubit encoding used by taper_qubits / run_vqe_emb
    # (the "second_quantised" output itself is mapping-agnostic)
    qubit_mapping: Literal["jw", "bk", "parity"] = "jw"

    # consumed: scales the engine's chunked-intermediate memory knobs
    # (SCFEngine.max_memory_mb — DF-exchange chunk, XC table/stream switch)
    max_ram_memory: PositiveInt = 4000
    max_hf_cycles: PositiveInt = Field(default=50)
    max_dft_cycles: PositiveInt = Field(default=50)

    @field_validator("symmetry")
    @classmethod
    def _reject_symmetry(cls, v: bool) -> bool:
        if v:
            raise ValueError(
                "symmetry=True is not supported: point-group symmetry is a "
                "PySCF Mole feature the TPU backend does not use (dense "
                "kernels gain nothing from it). Remove the flag or set "
                "symmetry=false."
            )
        return v


def overwrite_config_kwargs(config: NbedConfig, **config_kwargs) -> NbedConfig:
    """Overwrite config values with keywords and revalidate (config.py:148-168)."""
    if not config_kwargs:
        return config
    config_dict = config.model_dump()
    config_dict.update(config_kwargs)
    return NbedConfig(**config_dict)


def parse_config(config: "NbedConfig | str | None" = None, **config_kwargs) -> NbedConfig:
    """Resolve the three accepted config inputs into a validated model.

    Accepts a validated model, a path to a JSON file, or bare keyword
    arguments; unknown objects fall back to keyword parsing
    (reference config.py:171-207).
    """
    match config:
        case NbedConfig():
            config = overwrite_config_kwargs(config, **config_kwargs)
        case str() | Path():
            with open(FilePath(config)) as f:
                data = json.load(f)
            config = overwrite_config_kwargs(NbedConfig(**data), **config_kwargs)
        case None:
            config = NbedConfig(**config_kwargs)
        case _:
            logger.warning("Unknown input to config argument will be ignored.")
            config = NbedConfig(**config_kwargs)
    return config
