"""STO-3G basis data.

STO-3G is defined (Hehre, Stewart & Pople, J. Chem. Phys. 51, 2657 (1969))
as fixed three-Gaussian fits of Slater orbitals with zeta = 1, scaled per
element/shell by zeta**2 on the exponents. The distributed tables (EMSL/BSE,
also shipped by PySCF) are those rule values *rounded to 8 significant
digits*; energies are sensitive enough to core exponents (~1e-6 Ha for a
1e-8 relative change) that we store the standard rounded literals for the
common elements to match reference energies exactly, and fall back to the
generating rule elsewhere.
"""

# zeta=1 three-Gaussian fits (exponent, coefficient) per Slater shell type.
_FIT_1S = [(2.227660584, 0.154328967), (0.405771156, 0.535328142), (0.109818, 0.444634542)]
_FIT_2S = [(0.994203, -0.0999672), (0.231031, 0.399513), (0.0751386, 0.700115)]
_FIT_2P = [(0.994203, 0.155916), (0.231031, 0.607684), (0.0751386, 0.391957)]

# Standard molecular scaling factors zeta = (zeta_1s, zeta_2sp) per element.
_ZETA = {
    "H": (1.24,),
    "He": (1.69,),
    "Li": (2.69, 0.80),
    "Be": (3.68, 1.15),
    "B": (4.68, 1.45),
    "C": (5.67, 1.72),
    "N": (6.67, 1.95),
    "O": (7.66, 2.25),
    "F": (8.65, 2.55),
    "Ne": (9.64, 2.88),
}

_S_COEF = (0.15432897, 0.53532814, 0.44463454)
_SP_S_COEF = (-0.09996723, 0.39951283, 0.70011547)
_SP_P_COEF = (0.15591627, 0.60768372, 0.39195739)

# Published (rounded) exponent tables: {element: (exps_1s, exps_2sp)}
_PUBLISHED_EXPS = {
    "H": ((3.42525091, 0.62391373, 0.16885540), None),
    "He": ((6.36242139, 1.15892300, 0.31364979), None),
    "C": ((71.61683700, 13.04509600, 3.53051220),
          (2.94124940, 0.68348310, 0.22228990)),
    "N": ((99.10616900, 18.05231200, 4.88566020),
          (3.78045590, 0.87849660, 0.28571440)),
    "O": ((130.70932000, 23.80886100, 6.44360830),
          (5.03315130, 1.16959610, 0.38038900)),
    "F": ((166.67913000, 30.36081200, 8.21682070),
          (6.46480320, 1.50228120, 0.48858850)),
}


def _scale(fit, zeta):
    z2 = zeta * zeta
    return [(a * z2, c) for a, c in fit]


def _element(sym):
    published = _PUBLISHED_EXPS.get(sym)
    zetas = _ZETA[sym]
    if published is not None:
        exps_1s, exps_2sp = published
        shells = [(0, list(zip(exps_1s, _S_COEF)))]
        if exps_2sp is not None:
            shells.append((0, list(zip(exps_2sp, _SP_S_COEF))))
            shells.append((1, list(zip(exps_2sp, _SP_P_COEF))))
        return shells
    shells = [(0, _scale(_FIT_1S, zetas[0]))]
    if len(zetas) > 1:
        shells.append((0, _scale(_FIT_2S, zetas[1])))
        shells.append((1, _scale(_FIT_2P, zetas[1])))
    return shells


STO3G = {sym: _element(sym) for sym in _ZETA}
