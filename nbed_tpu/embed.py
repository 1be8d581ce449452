"""Public API façade: ``nbed(config | path | kwargs)`` (reference nbed/embed.py)."""

import logging

from .config import NbedConfig, parse_config

logger = logging.getLogger(__name__)


def nbed(config: "NbedConfig | str | None" = None, **config_kwargs):
    """Run the full embedding pipeline and return the driver.

    Accepts a validated :class:`NbedConfig`, a path to a JSON config file, or
    bare keyword arguments (reference embed.py:39-80).

    Returns:
        NbedDriver: the completed driver with ``mu`` / ``huzinaga`` result
        dicts, ``embedded_scf`` and ``classical_energy`` populated.
    """
    from .driver import NbedDriver
    from .utils import setup_logs

    # the reference initialises its .nbed.log at package import
    # (reference __init__.py:9); we defer to first API use so that merely
    # importing the library has no filesystem side effects.
    setup_logs()
    config = parse_config(config, **config_kwargs)
    driver = NbedDriver(config)
    driver.embed()
    return driver


def cli() -> None:
    """Console entry point: ``nbed-tpu --config <file.json>``."""
    from .utils import parse

    nbed(parse())


if __name__ == "__main__":
    cli()
