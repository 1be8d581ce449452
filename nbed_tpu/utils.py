"""Logging setup, CLI parsing and XYZ helpers (reference nbed/utils.py)."""

import argparse
import json
import logging
import logging.config
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


def setup_logs() -> None:
    """Initialise logging: DEBUG file handler + WARNING stream handler.

    Mirrors reference utils.py:19-49 (file ``.nbed.log``, mode 'w').
    """
    config_dict = {
        "version": 1,
        "disable_existing_loggers": False,
        "formatters": {
            "standard": {"format": "%(asctime)s: %(name)s: %(levelname)s: %(message)s"},
        },
        "handlers": {
            "file_handler": {
                "class": "logging.FileHandler",
                "level": "DEBUG",
                "formatter": "standard",
                "filename": ".nbed.log",
                "mode": "w",
                "encoding": "utf-8",
            },
            "stream_handler": {
                "class": "logging.StreamHandler",
                "level": "WARNING",
                "formatter": "standard",
            },
        },
        "loggers": {
            "": {"handlers": ["file_handler", "stream_handler"], "level": "DEBUG"}
        },
    }
    logging.config.dictConfig(config_dict)
    logging.getLogger(__name__).debug("Logging initialised.")


def parse():
    """Parse CLI arguments: ``nbed-tpu --config <file.json>``.

    Unlike the reference (utils.py:72, which passes the dict positionally and
    always raises TypeError), the config JSON is expanded as keyword args.
    """
    from .config import NbedConfig

    parser = argparse.ArgumentParser(description="Output embedded qubit Hamiltonian.")
    parser.add_argument(
        "--config",
        required=True,
        type=str,
        help="Path to a JSON config file.",
    )
    args = parser.parse_args()
    with open(Path(args.config).absolute()) as f:
        config_data = json.load(f)
    return NbedConfig(**config_data)


def pubchem_mol_geometry(molecule_name, timeout: float = 10.0) -> dict:
    """Fetch a 3-D geometry from PubChem by compound name.

    Same output contract as the reference (utils.py:80-112, which wraps
    OpenFermion's PubChem lookup): ``{index: (symbol, (x, y, z))}`` in
    angstrom.  Implemented directly against the PubChem PUG REST API
    (record JSON with ``record_type=3d``); raises a clear error when the
    molecule is unknown or the host has no network access.
    """
    import urllib.error
    import urllib.parse
    import urllib.request

    name = urllib.parse.quote(str(molecule_name))
    url = (
        "https://pubchem.ncbi.nlm.nih.gov/rest/pug/compound/name/"
        f"{name}/record/JSON?record_type=3d"
    )
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            record = json.load(resp)
    except urllib.error.HTTPError as exc:
        raise ValueError(
            f"Could not find a 3-D geometry of '{molecule_name}' on PubChem "
            "... make sure the input is a correct path to an xyz file or a "
            "real molecule"
        ) from exc
    except (urllib.error.URLError, OSError) as exc:
        raise RuntimeError(
            "PubChem geometry lookup requires network access, which is not "
            "available. Provide an XYZ string or file instead."
        ) from exc

    compound = record["PC_Compounds"][0]
    zs = compound["atoms"]["element"]
    conf = compound["coords"][0]["conformers"][0]
    xs, ys = conf["x"], conf["y"]
    zc = conf.get("z", [0.0] * len(xs))
    from .chem.periodic import Z_TO_SYMBOL

    struct_dict = {}
    for ind, (z, x, y, zz) in enumerate(zip(zs, xs, ys, zc)):
        struct_dict[ind] = (Z_TO_SYMBOL[z], (x, y, zz))
    return struct_dict


def build_ordered_xyz_string(struct_dict: dict, active_atom_inds: list) -> str:
    """Build an XYZ string with the chosen active atoms listed first.

    Matches reference utils.py:115-190 semantics (active atoms promoted to
    the top so ``n_active_atoms`` selects them).
    """
    if not set(active_atom_inds).issubset(set(struct_dict.keys())):
        raise ValueError(
            "active atom indices not subset of indices in structural dict "
        )
    ordering = (
        *active_atom_inds,
        *[ind for ind in struct_dict.keys() if ind not in active_atom_inds],
    )
    xyz_file = f"{len(struct_dict)}\n \n"
    for atom_ind in ordering:
        atom, xyz = struct_dict[atom_ind]
        xyz_file += f"{atom}\t{xyz[0]}\t{xyz[1]}\t{xyz[2]}\n"
    return xyz_file


def save_ordered_xyz_file(
    file_name: str,
    struct_dict: dict,
    active_atom_inds: list,
    save_location: Optional[Path] = None,
) -> Path:
    """Write the ordered XYZ to ``<loc>/molecular_structures/<name>.xyz``."""
    xyz_string = build_ordered_xyz_string(struct_dict, active_atom_inds)
    if save_location is None:
        save_location = Path(os.getcwd())
    output_dir = os.path.join(str(save_location), "molecular_structures")
    os.makedirs(output_dir, exist_ok=True)
    xyz_file_path = os.path.join(output_dir, f"{file_name}.xyz")
    with open(xyz_file_path, "w") as outfile:
        outfile.write(xyz_string)
    return Path(xyz_file_path)
