"""Checkpoint/resume for SCF solutions and driver results.

The reference has no checkpointing (SURVEY.md §5.4 — only a buggy JSON
savefile, driver.py:918-921). Here SCF solutions round-trip through ``.npz``
and a saved solution can warm-start a new SCF (``dm0`` seeding), which is
the expensive-to-recompute state of this pipeline.
"""

import json
import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["save_solution", "load_solution", "save_results", "load_results"]


def save_solution(path, sol) -> None:
    """Persist an :class:`nbed_tpu.scf.engine.SCFSolution` to ``.npz``."""
    data = {
        "mo_coeff": np.asarray(sol.mo_coeff),
        "mo_energy": np.asarray(sol.mo_energy),
        "mo_occ": np.asarray(sol.mo_occ),
        "e_tot": np.asarray(sol.e_tot),
        "converged": np.asarray(sol.converged),
        "nelec": np.asarray(sol.nelec),
    }
    if sol.v_emb is not None:
        data["v_emb"] = np.asarray(sol.v_emb)
    if sol.huzinaga_op is not None:
        data["huzinaga_op"] = np.asarray(sol.huzinaga_op)
    np.savez(path, **data)
    logger.info("Saved SCF solution to %s", path)


def load_solution(path, engine):
    """Rebuild an SCFSolution against an engine (same molecule/method)."""
    from .scf.engine import SCFSolution

    with np.load(path) as data:
        return SCFSolution(
            engine=engine,
            nelec=tuple(int(x) for x in data["nelec"]),
            mo_coeff=data["mo_coeff"],
            mo_energy=data["mo_energy"],
            mo_occ=data["mo_occ"],
            e_tot=float(data["e_tot"]),
            converged=bool(data["converged"]),
            v_emb=data["v_emb"] if "v_emb" in data else None,
            huzinaga_op=data["huzinaga_op"] if "huzinaga_op" in data else None,
        )


def _clean(obj):
    if isinstance(obj, dict):
        return {k: _clean(v) for k, v in obj.items() if _clean(v) is not None}
    if isinstance(obj, (int, float, np.floating, np.integer)):
        return float(obj)
    if isinstance(obj, np.ndarray) and obj.size <= 4096:
        return obj.tolist()
    if isinstance(obj, tuple):
        return [_clean(x) for x in obj]
    return None


def save_results(path, driver) -> None:
    """JSON dump of the driver's scalar/small-array results."""
    payload = {
        "mu": _clean(driver.mu) if driver.mu else None,
        "huzinaga": _clean(driver.huzinaga) if driver.huzinaga else None,
        "e_act": float(driver.e_act),
        "e_env": float(driver.e_env),
        "two_e_cross": float(driver.two_e_cross),
        "e_nuc": float(driver.e_nuc),
        "timings": getattr(driver, "timings", {}),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    logger.info("Saved driver results to %s", path)


def load_results(path) -> dict:
    with open(path) as f:
        return json.load(f)
