"""Generate Lebedev quadrature tables by solving the moment equations.

A Lebedev rule of octahedral symmetry and algebraic degree p is a union of
group orbits (a1: 6 points (1,0,0); a2: 12 points (s,s,0)/sqrt2; a3: 8 points
(s,s,s)/sqrt3; b(l): 24 points (l,l,m); c(q): 24 points (q,sqrt(1-q^2),0);
d(r,s): 48 general points) whose weights/parameters make the rule integrate
every spherical harmonic up to degree p exactly.  For each rule the number of
free parameters equals the number of independent octahedral-invariant moment
conditions, so the rule is an isolated root of the (overdetermined but
consistent) even-monomial moment system

    sum_i w_i x_i^{2a} y_i^{2b} z_i^{2c} = M_{abc}
    M_{abc} = (2a)!(2b)!(2c)! s! / ((2s+1)! a! b! c!),  s = a+b+c <= (p-1)/2

(weights normalised to sum to 1).  We solve that system with Gauss-Newton
from seed values of the published rules; the solved tables are then verified
to integrate all real spherical harmonics Y_lm, l <= p, to ~1e-14, which is a
complete, self-contained correctness proof (any rule passing it is THE
quadrature of that orbit structure).  Output: nbed_tpu/grids/data_lebedev.py.

Run:  python scripts/gen_lebedev.py
"""

import math
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# ----------------------------------------------------------------- orbits

SQ2 = 1.0 / math.sqrt(2.0)
SQ3 = 1.0 / math.sqrt(3.0)


def orbit_a1():
    pts = []
    for ax in range(3):
        for sg in (1.0, -1.0):
            p = [0.0, 0.0, 0.0]
            p[ax] = sg
            pts.append(p)
    return np.array(pts)


def orbit_a2():
    pts = []
    for ax in range(3):  # zero position
        i, j = [k for k in range(3) if k != ax]
        for si in (1.0, -1.0):
            for sj in (1.0, -1.0):
                p = [0.0, 0.0, 0.0]
                p[i] = si * SQ2
                p[j] = sj * SQ2
                pts.append(p)
    return np.array(pts)


def orbit_a3():
    pts = []
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                pts.append([sx * SQ3, sy * SQ3, sz * SQ3])
    return np.array(pts)


def orbit_b(l):
    m = np.sqrt(max(1.0 - 2.0 * l * l, 0.0))
    pts = []
    for ax in range(3):  # position of m
        for sx in (1.0, -1.0):
            for sy in (1.0, -1.0):
                for sz in (1.0, -1.0):
                    p = [l, l, l]
                    p[ax] = m
                    pts.append([p[0] * sx, p[1] * sy, p[2] * sz])
    return np.array(pts)


def orbit_c(q):
    r = np.sqrt(max(1.0 - q * q, 0.0))
    pts = []
    for ax in range(3):  # position of the zero
        i, j = [k for k in range(3) if k != ax]
        for (u, v) in ((q, r), (r, q)):
            for si in (1.0, -1.0):
                for sj in (1.0, -1.0):
                    p = [0.0, 0.0, 0.0]
                    p[i] = si * u
                    p[j] = sj * v
                    pts.append(p)
    return np.array(pts)


def orbit_d(r, s):
    t = np.sqrt(max(1.0 - r * r - s * s, 0.0))
    import itertools

    pts = []
    for perm in itertools.permutations((r, s, t)):
        for sx in (1.0, -1.0):
            for sy in (1.0, -1.0):
                for sz in (1.0, -1.0):
                    pts.append([perm[0] * sx, perm[1] * sy, perm[2] * sz])
    return np.array(pts)


def expand(spec, params):
    """spec: dict(a1,a2,a3 bools, nb, nc, nd). params: flat vector.
    Layout: [w_a1?][w_a2?][w_a3?] + nb*(l,w) + nc*(q,w) + nd*(r,s,w).
    Returns (points (N,3), weights (N,))."""
    pts, wts = [], []
    i = 0
    for key, fn in (("a1", orbit_a1), ("a2", orbit_a2), ("a3", orbit_a3)):
        if spec.get(key):
            o = fn()
            pts.append(o)
            wts.append(np.full(len(o), params[i]))
            i += 1
    for _ in range(spec.get("nb", 0)):
        l, w = params[i], params[i + 1]
        i += 2
        o = orbit_b(l)
        pts.append(o)
        wts.append(np.full(len(o), w))
    for _ in range(spec.get("nc", 0)):
        q, w = params[i], params[i + 1]
        i += 2
        o = orbit_c(q)
        pts.append(o)
        wts.append(np.full(len(o), w))
    for _ in range(spec.get("nd", 0)):
        r, s, w = params[i], params[i + 1], params[i + 2]
        i += 3
        o = orbit_d(r, s)
        pts.append(o)
        wts.append(np.full(len(o), w))
    return np.concatenate(pts), np.concatenate(wts)


# ------------------------------------------------------- moment equations

def monomial_list(p):
    smax = (p - 1) // 2 if p % 2 else p // 2
    out = []
    for s in range(smax + 1):
        for a in range(s, -1, -1):
            for b in range(s - a, -1, -1):
                c = s - a - b
                if a >= b >= c:
                    out.append((a, b, c))
    return out


def exact_moment(a, b, c):
    s = a + b + c
    num = (
        math.factorial(2 * a) * math.factorial(2 * b) * math.factorial(2 * c)
        * math.factorial(s)
    )
    den = (
        math.factorial(2 * s + 1)
        * math.factorial(a) * math.factorial(b) * math.factorial(c)
    )
    return num / den


def residual(spec, monos, targets, params):
    pts, wts = expand(spec, params)
    x2 = pts ** 2
    res = np.empty(len(monos))
    for k, (a, b, c) in enumerate(monos):
        val = np.sum(wts * x2[:, 0] ** a * x2[:, 1] ** b * x2[:, 2] ** c)
        res[k] = (val - targets[k]) / targets[k]
    return res


def solve(spec, monos, targets, p0, max_iter=200):
    """Gauss-Newton with numerical Jacobian and Levenberg damping."""
    p = np.asarray(p0, dtype=np.float64)
    lam = 1e-10
    r = residual(spec, monos, targets, p)
    cost = float(r @ r)
    for _ in range(max_iter):
        # central-difference Jacobian
        jac = np.empty((len(r), len(p)))
        for j in range(len(p)):
            h = 1e-7 * max(abs(p[j]), 1e-3)
            pp = p.copy(); pp[j] += h
            pm = p.copy(); pm[j] -= h
            jac[:, j] = (residual(spec, monos, targets, pp)
                         - residual(spec, monos, targets, pm)) / (2 * h)
        a = jac.T @ jac
        g = jac.T @ r
        for _ in range(60):
            try:
                step = np.linalg.solve(a + lam * np.diag(np.diag(a) + 1e-30), g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            pn = p - step
            rn = residual(spec, monos, targets, pn)
            cn = float(rn @ rn)
            if np.isfinite(cn) and cn < cost:
                p, r, cost = pn, rn, cn
                lam = max(lam * 0.3, 1e-14)
                break
            lam *= 10
        else:
            break
        if cost < 1e-28:
            break
    return p, cost


# --------------------------------------------------------- verification

def _real_sph_harm(l, m, pts):
    """Real Y_lm on unit points via associated Legendre recurrence."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rxy = np.hypot(x, y)
    phi = np.arctan2(y, x)
    # P_l^m(z) with Condon-Shortley, m >= 0
    am = abs(m)
    pmm = np.ones_like(z)
    fact = 1.0
    somx2 = rxy  # sqrt(1 - z^2)
    for i in range(am):
        pmm = -pmm * fact * somx2
        fact += 2.0
    if l == am:
        plm = pmm
    else:
        pmmp1 = z * (2 * am + 1) * pmm
        if l == am + 1:
            plm = pmmp1
        else:
            for ll in range(am + 2, l + 1):
                pll = (z * (2 * ll - 1) * pmmp1 - (ll + am - 1) * pmm) / (ll - am)
                pmm, pmmp1 = pmmp1, pll
            plm = pmmp1
    norm = math.sqrt(
        (2 * l + 1) / (4 * math.pi)
        * math.factorial(l - am) / math.factorial(l + am)
    )
    if m > 0:
        return math.sqrt(2.0) * norm * plm * np.cos(am * phi)
    if m < 0:
        return math.sqrt(2.0) * norm * plm * np.sin(am * phi)
    return norm * plm


def verify_degree(pts, wts, p):
    """Max |sum_i w_i Y_lm(x_i) - delta_l0/sqrt(4pi)| over l <= p."""
    worst = 0.0
    for l in range(p + 1):
        for m in range(-l, l + 1):
            v = float(np.sum(wts * _real_sph_harm(l, m, pts)))
            tgt = 1.0 / math.sqrt(4.0 * math.pi) if l == 0 and m == 0 else 0.0
            worst = max(worst, abs(v - tgt))
    return worst


# ------------------------------------------------------------ rule seeds
# Orbit structures are fixed by the parameter-count identity
# (#unknowns == #independent invariant moments, see module docstring).
# Seed values: published Lebedev-Laikov parameters where known (public
# numerical constants); None -> multistart search.

RULES = {
    6: dict(p=3, spec=dict(a1=1), seed=[1 / 6]),
    14: dict(p=5, spec=dict(a1=1, a3=1), seed=[1 / 15, 3 / 40]),
    26: dict(p=7, spec=dict(a1=1, a2=1, a3=1),
             seed=[1 / 21, 4 / 105, 9 / 280]),
    38: dict(p=9, spec=dict(a1=1, a3=1, nc=1),
             seed=[1 / 105, 9 / 280, 0.4597008433809831, 1 / 35]),
    50: dict(p=11, spec=dict(a1=1, a2=1, a3=1, nb=1),
             seed=[4 / 315, 64 / 2835, 27 / 1280,
                   0.3015113445777636, 0.02017333553791887]),
    74: dict(p=13, spec=dict(a1=1, a2=1, a3=1, nb=1, nc=1),
             seed=[5.13067179733846e-4, 0.01660406956574204,
                   -0.02958603896103896,
                   0.4803844614152614, 0.02657620708293468,
                   0.3207726489807764, 0.01652217099371571]),
    86: dict(p=15, spec=dict(a1=1, a3=1, nb=2, nc=1),
             seed=[0.01154401154401154, 0.01194390908585628,
                   0.3696028464541502, 0.01111055571060340,
                   0.6943540066026664, 0.01187650129453714,
                   0.3742430390903412, 0.01181230374690448]),
    110: dict(p=17, spec=dict(a1=1, a3=1, nb=3, nc=1),
              seed=[0.003828270494937162, 0.009793737512487512,
                    0.1851156353447362, 0.008211737283191111,
                    0.6904210483822922, 0.009942814891178103,
                    0.3956894730559419, 0.009595471336070963,
                    0.4783690288121502, 0.009694996361663028]),
    146: dict(p=19, spec=dict(a1=1, a2=1, a3=1, nb=3, nd=1),
              seed=[5.996313688621381e-4, 0.007372999718620756,
                    0.007210515360144488,
                    0.6764410400114264, 0.007116355493117555,
                    0.4174961227965453, 0.006753829486314477,
                    0.1574676672039082, 0.007574394159054034,
                    0.1403553811713183, 0.4493328323269557,
                    0.006991087353303262]),
    170: dict(p=21, spec=dict(a1=1, a2=1, a3=1, nb=3, nc=1, nd=1),
              seed=[0.005544842902037365, 0.006071332770670752,
                    0.006383674773515093,
                    0.2551252621114134, 0.005183387587747790,
                    0.6743601460362766, 0.006317929009813725,
                    0.4318910696719410, 0.006201670006589077,
                    0.2613931360335988, 0.005477143385137348,
                    0.4990453161796037, 0.1446630744325115,
                    0.005968383987681156]),
    194: dict(p=23, spec=dict(a1=1, a2=1, a3=1, nb=4, nc=1, nd=1),
              seed=[0.001782340447244611, 0.005716905949977102,
                    0.005573383178848738,
                    0.6712973442695226, 0.005608704082587997,
                    0.2892465627575439, 0.005158237711805383,
                    0.4446933178717437, 0.005518771467273614,
                    0.1299335447650067, 0.004106777028169394,
                    0.3457702197611283, 0.005051846064614808,
                    0.1590417105383530, 0.8360360154824589,
                    0.005530248916233094]),
    230: dict(p=25, spec=dict(a1=1, a3=1, nb=5, nc=2, nd=1),
              seed=[-0.05522639919727325, 0.004450274607445226,
                    0.4492044687397611, 0.004496841067921404,
                    0.2520419490210201, 0.005049153450478750,
                    0.6981906658447242, 0.003976408018051883,
                    0.6587405243460960, 0.004401400650381014,
                    0.0403854405009766, 0.01724544350544401,
                    0.5823842309715585, 0.004231083095357343,
                    0.3545877390518688, 0.005198069864064399,
                    0.2272181808998187, 0.4864661535886647,
                    0.004695720972568883]),
    266: dict(p=27, spec=dict(a1=1, a2=1, a3=1, nb=5, nc=1, nd=2),
              seed=[-0.001313769127326952, -0.002522728704859336,
                    0.004186853881700583,
                    0.7039373391585475, 0.005315167977810885,
                    0.1012526248572414, 0.004047142377086219,
                    0.4647448726420539, 0.004112482394406990,
                    0.3277420654971629, 0.003595584899758782,
                    0.6620338663699974, 0.004256131351428158,
                    0.8506508083520399, 0.004229582700647240,
                    0.3233484542692899, 0.1153112011009701,
                    0.004080914225780505,
                    0.2314790158712601, 0.5244939240922365,
                    0.004071467593830964]),
    302: dict(p=29, spec=dict(a1=1, a3=1, nb=6, nc=2, nd=2),
              seed=[8.545911725128148e-4, 0.003599119285025571,
                    0.3515640345570105, 0.003449788424305883,
                    0.6566329410219612, 0.003604822601419882,
                    0.4729054132581005, 0.003576729661743367,
                    0.09618308522614784, 0.002352101413689164,
                    0.2219645236294178, 0.003108953122413675,
                    0.7011766416089545, 0.003650045807677255,
                    0.2644152887060663, 0.002982344963171804,
                    0.5718955891878961, 0.003600820932216460,
                    0.2510034751770465, 0.8000727494073952,
                    0.003571540554273387,
                    0.1233548532583327, 0.4127724083168531,
                    0.003392312205006170]),
    # Seeds below are *approximate* recollections of the published
    # Lebedev-Laikov parameters (public numerical constants).  They only
    # need to land in the Gauss-Newton basin: correctness is established
    # solely by the moment-equation solve converging (cost < 1e-24) and the
    # independent Y_lm verification to <1e-12 — a wrong seed digit either
    # gets polished away or the rule is rejected, never silently shipped.
    350: dict(p=31, spec=dict(a1=1, a3=1, nb=6, nc=2, nd=3),
              seed=[0.3006796749453936e-2,
                    0.3050627745650771e-2,
                    0.7068965463912316, 0.1621104600288991e-2,
                    0.4794682625712025, 0.3005701484901752e-2,
                    0.1927533154878019, 0.2990992529653774e-2,
                    0.6930357961327123, 0.2982170644107595e-2,
                    0.3608302115520091, 0.2721564237310992e-2,
                    0.6498486161496169, 0.3033513795811141e-2,
                    0.1932945013230339, 0.3007949555218533e-2,
                    0.3800494919899303, 0.2881964603055307e-2,
                    0.2899558825499574, 0.7934537856582316, 0.2958357626535696e-2,
                    0.09684121455103957, 0.8280801506686862, 0.3036020026407088e-2,
                    0.1833434647041659, 0.9074658265305127, 0.2832187403926303e-2],
              alt_specs=[dict(a1=1, a3=1, nb=5, nc=3, nd=3),
                         dict(a1=1, a3=1, nb=7, nc=1, nd=3),
                         dict(a1=1, a3=1, nb=4, nc=4, nd=3)]),
    434: dict(p=35, spec=dict(a1=1, a2=1, a3=1, nb=7, nc=2, nd=4),
              seed=[0.5265897968224436e-3,
                    0.2548219972002607e-2,
                    0.2512317418927307e-2,
                    0.6909346307509111, 0.2530403801186355e-2,
                    0.1774836054609158, 0.2014279020918528e-2,
                    0.4914342637512472, 0.2501725168402936e-2,
                    0.6456664707424256, 0.2513267174597564e-2,
                    0.2861289010307638, 0.2302694782227416e-2,
                    0.07568084367178018, 0.1462495621594614e-2,
                    0.3927259763368002, 0.2445373437312980e-2,
                    0.8818132877794288, 0.2417442375638981e-2,
                    0.9776428111182649, 0.1910951282179532e-2,
                    0.2054823696403044, 0.8689460322872412, 0.2416930044324775e-2,
                    0.5905157048925271, 0.7999278543857286, 0.2512236854563495e-2,
                    0.5550152361076807, 0.7717462626915901, 0.2496644054553086e-2,
                    0.9371809858553722, 0.3344363145343455, 0.2236607760437849e-2],
              alt_specs=[dict(a1=1, a2=1, a3=1, nb=6, nc=3, nd=4),
                         dict(a1=1, a2=1, a3=1, nb=8, nc=1, nd=4)]),
    590: dict(p=41, spec=dict(a1=1, a3=1, nb=9, nc=3, nd=6),
              seed=[0.3095121295306187e-3,
                    0.1852379698597489e-2,
                    0.7040954938227469, 0.1871790639277744e-2,
                    0.6807744066455243, 0.1858812585438317e-2,
                    0.6372546939258752, 0.1852028828296213e-2,
                    0.5044419707800358, 0.1846715956151242e-2,
                    0.4215761784010967, 0.1818471778162769e-2,
                    0.3317920736472123, 0.1749564657281154e-2,
                    0.2384736701421887, 0.1617210647254411e-2,
                    0.1459036449157763, 0.1384737234851692e-2,
                    0.06095034115507196, 0.9764331165051050e-3,
                    0.6116843442009876, 0.1857161196774078e-2,
                    0.3964755348199858, 0.1705153996395864e-2,
                    0.1724782009907724, 0.1300321685886048e-2,
                    0.5610263808622060, 0.3518280927733519, 0.1842866472905286e-2,
                    0.4742392842551980, 0.2634716655937950, 0.1802658934377451e-2,
                    0.5984126497885380, 0.1816640840360209, 0.1849830560443660e-2,
                    0.3791035407695563, 0.1720795225656878, 0.1713904507106709e-2,
                    0.2778673190586244, 0.08213021581932511, 0.1555213603396808e-2,
                    0.5033564271075117, 0.08999205842074875, 0.1802239128008525e-2]),
}


def n_params(spec):
    return (spec.get("a1", 0) + spec.get("a2", 0) + spec.get("a3", 0)
            + 2 * spec.get("nb", 0) + 2 * spec.get("nc", 0)
            + 3 * spec.get("nd", 0))


def n_points(spec):
    return (6 * spec.get("a1", 0) + 12 * spec.get("a2", 0)
            + 8 * spec.get("a3", 0) + 24 * spec.get("nb", 0)
            + 24 * spec.get("nc", 0) + 48 * spec.get("nd", 0))


def random_seed(spec, rng, n):
    p = []
    w0 = 1.0 / n
    for key in ("a1", "a2", "a3"):
        if spec.get(key):
            p.append(w0 * rng.uniform(0.2, 2.0))
    for _ in range(spec.get("nb", 0)):
        p += [rng.uniform(0.05, 0.7), w0 * rng.uniform(0.5, 1.5)]
    for _ in range(spec.get("nc", 0)):
        p += [rng.uniform(0.05, 0.69), w0 * rng.uniform(0.5, 1.5)]
    for _ in range(spec.get("nd", 0)):
        while True:
            r, s = rng.uniform(0.05, 0.9, size=2)
            if r * r + s * s < 0.95 and r < s:
                break
        p += [r, s, w0 * rng.uniform(0.5, 1.5)]
    return p


def _weight_slots(spec):
    """Indices of the weight entries in the flat param vector, in orbit
    order (one per orbit)."""
    slots = []
    i = 0
    for key in ("a1", "a2", "a3"):
        if spec.get(key):
            slots.append(i)
            i += 1
    for _ in range(spec.get("nb", 0)):
        slots.append(i + 1)
        i += 2
    for _ in range(spec.get("nc", 0)):
        slots.append(i + 1)
        i += 2
    for _ in range(spec.get("nd", 0)):
        slots.append(i + 2)
        i += 3
    return slots


def linear_weight_seed(spec, params, monos, targets):
    """Weights enter the moment system linearly: given the seed's node
    positions, replace its random weights with the least-squares solution,
    which puts the Gauss-Newton start in a far larger basin."""
    params = np.array(params, dtype=np.float64)
    slots = _weight_slots(spec)
    probe = params.copy()
    cols = []
    for k, sl in enumerate(slots):
        for j, s2 in enumerate(slots):
            probe[s2] = 1.0 if j == k else 0.0
        pts, wts = expand(spec, probe)
        x2 = pts ** 2
        col = np.array([
            np.sum(wts * x2[:, 0] ** a * x2[:, 1] ** b * x2[:, 2] ** c)
            for (a, b, c) in monos
        ])
        cols.append(col)
    m = np.stack(cols, axis=1)
    w, *_ = np.linalg.lstsq(m, targets, rcond=None)
    for sl, wk in zip(slots, w):
        params[sl] = wk
    return params


def solve_rule(n, info, tries=None, seed0=0):
    if tries is None:
        tries = int(os.environ.get("LEBEDEV_TRIES", 400))
    p = info["p"]
    monos = monomial_list(p)
    targets = np.array([exact_moment(*m) for m in monos])
    if info["seed"] is not None:
        spec = info["spec"]
        assert n_points(spec) == n, (n, n_points(spec))
        params, cost = solve(spec, monos, targets, info["seed"])
        if cost < 1e-24:
            return spec, params, cost
        print(f"  n={n}: seeded solve cost={cost:.3e}; falling back")
    rng = np.random.default_rng(seed0)
    best = (None, None, np.inf)
    specs = [info["spec"]] + info.get("alt_specs", [])
    for spec in specs:
        assert n_points(spec) == n, (n, n_points(spec))
    for t in range(tries):
        spec = specs[t % len(specs)]
        p0 = linear_weight_seed(spec, random_seed(spec, rng, n), monos, targets)
        params, cost = solve(spec, monos, targets, p0, max_iter=120)
        if cost < best[2]:
            best = (spec, params, cost)
        if cost < 1e-24:
            print(f"  n={n}: converged on try {t} with spec {spec}")
            return spec, params, cost
    return best


def main():
    only = [int(a) for a in sys.argv[1:]] or sorted(RULES)
    results = {}
    for n in only:
        info = RULES[n]
        print(f"solving N={n} (degree {info['p']}) ...", flush=True)
        spec, params, cost = solve_rule(n, info)
        if params is None:
            print(f"  !! N={n} no solution found; skipping")
            continue
        pts, wts = expand(spec, params)
        err = verify_degree(pts, wts, info["p"])
        print(f"  cost={cost:.3e}  max Y_lm error={err:.3e}  sumw={wts.sum():.16f}")
        if err > 1e-12:
            print(f"  !! N={n} NOT verified; skipping")
            continue
        results[n] = (dict(p=info["p"], spec=spec), params)
    write_module(results)


def write_module(results):
    out = Path(__file__).resolve().parent.parent / "nbed_tpu" / "grids" / "data_lebedev.py"
    if out.exists():  # merge with previously solved rules
        scope = {}
        exec(out.read_text(), scope)
        for n, (p, spec, params) in scope.get("LEBEDEV_PARAMS", {}).items():
            if n not in results:
                results[n] = (dict(p=p, spec=spec), np.asarray(params))
    lines = [
        '"""Lebedev angular quadrature tables (auto-generated).',
        "",
        "Generated by scripts/gen_lebedev.py: orbit parameters solved from the",
        "octahedral moment equations and verified to integrate all spherical",
        "harmonics up to each rule's degree to <1e-12 (see the generator for",
        "the verification).  Weights sum to 1 (multiply by 4*pi for solid-angle",
        'integration).  Do not edit by hand."""',
        "",
        "import numpy as np",
        "",
        "# order -> (degree, spec, params); expanded lazily by lebedev_grid()",
        "LEBEDEV_PARAMS = {",
    ]
    for n in sorted(results):
        info, params = results[n]
        spec = {k: v for k, v in info["spec"].items() if v}
        plist = ", ".join(f"{v:.17e}" for v in params)
        lines.append(f"    {n}: ({info['p']}, {spec!r}, [{plist}]),")
    lines.append("}")
    lines.append("")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} with {len(results)} rules: {sorted(results)}")


if __name__ == "__main__":
    main()
