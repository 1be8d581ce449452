"""Composition-string XC specs (reference surface: arbitrary functional
strings forwarded to PySCF/libxc, reference driver.py:163-169).

The parser feeds the same term machinery as the registry, so a composition
equal to a registered functional must produce bit-identical grid values —
verified here through full SCF energies.
"""

import numpy as np
import pytest

from nbed_tpu.chem import build_molecule
from nbed_tpu.dft.functionals import parse_composition, resolve_functional
from nbed_tpu.scf.engine import SCFEngine

H2 = "2\n\nH 0.0 0.0 0.0\nH 0.0 0.0 0.74\n"

B3LYP_SPEC = "0.2*HF + 0.08*SLATER + 0.72*B88 + 0.81*LYP + 0.19*VWN_RPA"
CAM_SPEC = ("0.19*HF + 0.46*LR_HF(0.33) + 0.35*B88 + 0.46*SR_B88(0.33) "
            "+ 0.19*VWN5 + 0.81*LYP")


def _e_tot(xc):
    mol = build_molecule(H2, "sto-3g")
    return SCFEngine(mol, xc=xc, conv_tol=1e-10, max_cycle=100).kernel().e_tot


def test_b3lyp_composition_matches_registry():
    assert np.isclose(_e_tot(B3LYP_SPEC), _e_tot("b3lyp"), atol=1e-10)


def test_pbe0_comma_form_matches_registry():
    assert np.isclose(_e_tot("0.25*HF + 0.75*PBE, PBE"), _e_tot("pbe0"),
                      atol=1e-10)


@pytest.mark.slow
def test_camb3lyp_composition_matches_registry():
    assert np.isclose(_e_tot(CAM_SPEC), _e_tot("camb3lyp"), atol=1e-10)


def test_unknown_name_error_carries_composition_hint():
    with pytest.raises(KeyError, match="composition"):
        resolve_functional("no_such_functional_123")


def test_mixed_omegas_rejected():
    with pytest.raises(ValueError, match="omega"):
        parse_composition("0.5*LR_HF(0.3) + 0.5*LR_HF(0.4)")


def test_scaled_compound_expansion():
    terms, hyb, rsh = parse_composition("0.5*b3lyp + 0.5*blyp")
    assert rsh is None and np.isclose(hyb, 0.10)
    coefs = sorted(round(c, 6) for c, _ in terms)
    assert coefs == sorted([0.04, 0.36, 0.405, 0.095, 0.5, 0.5])


def test_exchange_only_comma_form():
    terms, hyb, rsh = parse_composition("b88,")
    assert hyb == 0.0 and rsh is None and len(terms) == 1


@pytest.mark.parametrize("name,frag", [
    ("M06-2X", "Minnesota"),
    ("MN15", "Minnesota"),
    ("B97-D", "wB97"),
    ("revTPSS", "original TPSS"),
    ("HSE06", "range separation"),
])
def test_unsupported_family_actionable_hint(name, frag):
    """VERDICT r4 #8: a reference config naming an unimplemented functional
    family must fail with a targeted hint naming what IS expressible."""
    from nbed_tpu.dft.functionals import resolve_functional

    with pytest.raises(KeyError) as exc:
        resolve_functional(name)
    msg = str(exc.value)
    assert frag in msg
    assert "Composition strings" in msg
