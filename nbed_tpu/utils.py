"""Logging setup, CLI parsing and XYZ helpers (reference nbed/utils.py)."""

import argparse
import json
import logging
import logging.config
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
    # during interpreter teardown JAX logs "Clearing JAX backend caches"
    # after pytest/capture has closed our handlers' streams; with
    # raiseExceptions the logging machinery then prints a
    # "--- Logging error ---" traceback into every captured tail.
    # Production-library stance: drop records whose handler is gone.
    logging.raiseExceptions = False
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

    The driver selects the active fragment as the *leading*
    ``n_active_atoms`` of the geometry, so promoting the chosen indices to
    the top is how an arbitrary active selection is expressed (same output
    contract as reference utils.py:115-190).

    Args:
        struct_dict: ``{index: (symbol, (x, y, z))}`` as returned by
            :func:`pubchem_mol_geometry` (angstrom).
        active_atom_inds: indices (keys of ``struct_dict``) to promote.
    """
    unknown = [i for i in active_atom_inds if i not in struct_dict]
    if unknown:
        raise ValueError(
            f"Active atom indices {unknown} do not exist in the structure "
            f"(valid indices: {sorted(struct_dict)})."
        )
    active = list(active_atom_inds)
    environment = [i for i in struct_dict if i not in set(active)]
    lines = [str(len(struct_dict)), " "]
    for idx in active + environment:
        symbol, (x, y, z) = struct_dict[idx]
        lines.append(f"{symbol}\t{x}\t{y}\t{z}")
    return "\n".join(lines) + "\n"


def save_ordered_xyz_file(
    file_name: str,
    struct_dict: dict,
    active_atom_inds: list,
    save_location: Optional[Path] = None,
) -> Path:
    """Write the ordered XYZ under ``<save_location>/molecular_structures/``.

    Returns the path of the written ``<file_name>.xyz`` (directory created
    as needed; defaults to the working directory, matching the reference's
    output layout, reference utils.py:193-222).
    """
    base = Path(save_location) if save_location is not None else Path.cwd()
    out_dir = base / "molecular_structures"
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{file_name}.xyz"
    out_path.write_text(build_ordered_xyz_string(struct_dict, active_atom_inds))
    return out_path
