"""Fermion-to-qubit mappings with a bitmask Pauli algebra.

Pauli strings are stored in canonical symplectic form ``coeff * X^x Z^z``
(per-qubit overlap X&Z encodes Y up to a tracked phase), so products are two
XORs and a popcount-controlled sign — no symbolic algebra. Jordan-Wigner,
Bravyi-Kitaev (Fenwick-tree / Seeley-Richard-Love construction) and the
parity encoding share one ladder-operator interface.

Replaces the reference's OpenFermion usage (``jordan_wigner`` +
``InteractionOperator``, reference tests/test_builder.py:62-68); qubit-
Hamiltonian terms/sec is a headline metric (BASELINE.md).
"""

import os

import numpy as np
from scipy.sparse.linalg import LinearOperator, eigsh

__all__ = ["PauliSum", "jordan_wigner", "bravyi_kitaev", "parity_transform",
           "pauli_sum_to_sparse", "pauli_ground_state"]


def _native_qubit_enabled() -> bool:
    """Native C++ term engine: NBED_TPU_QUBIT = auto (default) | native |
    python. ``native`` raises if the engine cannot be built."""
    mode = os.environ.get("NBED_TPU_QUBIT", "auto").lower()
    if mode == "python":
        return False
    from ..native import qubit_available

    ok = qubit_available()
    if mode == "native" and not ok:
        raise RuntimeError("NBED_TPU_QUBIT=native but the native qubit-term "
                           "engine failed to build.")
    return ok


def _popcount(x: int) -> int:
    return bin(x).count("1")


class PauliSum:
    """Sum of Pauli strings over ``n_qubits`` in canonical X^x Z^z form."""

    def __init__(self, n_qubits: int, terms=None):
        self.n_qubits = n_qubits
        self.terms = dict(terms or {})  # (x_mask, z_mask) -> complex coeff

    def add(self, coeff, x, z):
        if coeff == 0.0:
            return
        key = (x, z)
        new = self.terms.get(key, 0.0) + coeff
        if abs(new) < 1e-14:
            self.terms.pop(key, None)
        else:
            self.terms[key] = new

    def __len__(self):
        return len(self.terms)

    def compress(self, tol=1e-12):
        self.terms = {k: v for k, v in self.terms.items() if abs(v) > tol}
        return self

    def to_strings(self):
        """[(coeff, 'XIZY...')] with true Pauli-letter coefficients."""
        out = []
        for (x, z), c in sorted(self.terms.items()):
            letters = []
            n_y = 0
            for q in range(self.n_qubits):
                bx, bz = (x >> q) & 1, (z >> q) & 1
                if bx and bz:
                    letters.append("Y")
                    n_y += 1
                elif bx:
                    letters.append("X")
                elif bz:
                    letters.append("Z")
                else:
                    letters.append("I")
            # canonical X^xZ^z = (-i)^{nY} * sigma-string
            out.append((c * ((-1j) ** n_y), "".join(letters)))
        return out


def _mul(term_a, term_b):
    """(c, x, z) x (c, x, z) -> (c, x, z); phase from Z^z1 past X^x2."""
    ca, xa, za = term_a
    cb, xb, zb = term_b
    sign = -1.0 if (_popcount(za & xb) & 1) else 1.0
    return (ca * cb * sign, xa ^ xb, za ^ zb)


def _lowbit(i: int) -> int:
    return i & (-i)


def _bk_sets(j: int, n: int):
    """Fenwick-tree update/parity/flip sets for mode j (0-indexed)."""
    i = j + 1  # 1-indexed Fenwick node
    update = 0
    k = i + _lowbit(i)
    while k <= n:
        update |= 1 << (k - 1)
        k += _lowbit(k)
    parity = 0
    k = j  # prefix count of modes < j
    while k > 0:
        parity |= 1 << (k - 1)
        k -= _lowbit(k)
    flip = 0
    k = i - 1
    while k > i - _lowbit(i):
        flip |= 1 << (k - 1)
        k -= _lowbit(k)
    return update, parity, flip


def _ladder_factory(mapping: str, n: int):
    """Return f(mode, dagger) -> [(coeff, x, z), ...] (2 strings each)."""

    def jw(mode, dagger):
        x = 1 << mode
        zlow = (1 << mode) - 1
        s = -0.5 if dagger else 0.5
        # a = (X + iY)/2 Z_< = (X - XZ)/2 Z_<;  a+ = (X + XZ)/2 Z_<
        return [(0.5, x, zlow), (-s, x, zlow | x)]

    def bk(mode, dagger):
        update, parity, flip = _bk_sets(mode, n)
        xmask = update | (1 << mode)
        c_term = (0.5, xmask, parity)  # c_j = X_U X_j Z_P
        rho = parity & ~flip if (mode & 1) else parity
        # d_j = X_U Y_j Z_rho; Y = i X Z in canonical form
        d_term = (0.5j, xmask, rho | (1 << mode))
        sign = -1j if dagger else 1j
        # a = (c + i d)/2, a+ = (c - i d)/2 — halves folded into the 0.5s
        return [c_term, (sign * d_term[0] * 1.0, d_term[1], d_term[2])]

    def parity(mode, dagger):
        # Parity encoding: qubit j stores (n_0 + ... + n_j) mod 2, the
        # degenerate-Fenwick limit of BK — update set = every qubit above j,
        # parity set = {j-1}, flip set = {j-1} (so d_j carries no Z).
        #   c_j = X_{j+1..n-1} X_j Z_{j-1}
        #   d_j = X_{j+1..n-1} Y_j
        upper = (((1 << n) - 1) >> (mode + 1)) << (mode + 1)
        xmask = upper | (1 << mode)
        pmask = (1 << (mode - 1)) if mode > 0 else 0
        c_term = (0.5, xmask, pmask)
        d_term = (0.5j, xmask, 1 << mode)
        sign = -1j if dagger else 1j
        return [c_term, (sign * d_term[0] * 1.0, d_term[1], d_term[2])]

    return {"jw": jw, "bk": bk, "parity": parity}[mapping]


def _parity64(arr):
    """Bit parity of each element of an int64 array."""
    arr = arr.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        arr ^= arr >> shift
    return (arr & 1).astype(np.int64)


def _map_interaction_operator(constant, h1, h2, mapping: str, tol=1e-12) -> PauliSum:
    """Vectorised mapping: all nonzero h1/h2 entries processed per string
    combination with int64 bitmask arithmetic (<= 63 qubits; the generic
    python-int path covers larger registers)."""
    h1 = np.asarray(h1)
    h2 = np.asarray(h2)
    n = h1.shape[0]
    ladder = _ladder_factory(mapping, n)
    dag = [ladder(p, True) for p in range(n)]
    ann = [ladder(p, False) for p in range(n)]

    out = PauliSum(n)

    if n > 63:
        out.add(complex(constant), 0, 0)
        return _map_python(out, h1, h2, dag, ann, tol)

    # per-mode string tables: [combo][mode] -> x/z masks. For both JW and BK
    # the ladder *coefficients* are mode-independent scalars (JW: +-1/2;
    # BK: +-i/2), so signs can be tracked as xor'd parity bits and the
    # complex scale applied once per combo.
    def tables(ops):
        cs = np.array([ops[0][k][0] for k in (0, 1)], dtype=complex)
        assert all(t[k][0] == cs[k] for t in ops for k in (0, 1))
        xs = np.array([[t[k][1] for t in ops] for k in (0, 1)], dtype=np.int64)
        zs = np.array([[t[k][2] for t in ops] for k in (0, 1)], dtype=np.int64)
        return cs, xs, zs

    dc, dx, dz = tables(dag)
    ac, ax, az = tables(ann)

    if _native_qubit_enabled():
        from ..native import map_terms

        p1, q1 = np.nonzero(np.abs(h1) > tol)
        idx2 = np.nonzero(np.abs(h2) > tol)
        x_u, z_u, vals = map_terms(
            n, dx, dz, ax, az, dc, ac,
            np.stack([p1, q1], axis=1), h1[p1, q1],
            np.stack(idx2, axis=1), h2[idx2], tol,
        )
        out.terms.update(
            zip(zip(x_u.tolist(), z_u.tolist()), vals.tolist())
        )
        out.add(complex(constant), 0, 0)
        return out.compress(tol)

    # JW and parity ladder scalars are real (+-1/2) in canonical X^xZ^z
    # form: with real integrals every intermediate coefficient is real, and
    # float64 halves the memory traffic of the sort/gather/segment-sum
    # pipeline vs complex128. (Canonical-form string products only ever
    # contribute +-1 phases, so realness of the table scalars is sufficient.)
    cdt = (np.float64
           if mapping in ("jw", "parity")
           and not np.iscomplexobj(h1) and not np.iscomplexobj(h2)
           else np.complex128)

    all_x, all_z, all_c = [], [], []

    def accumulate(coeffs, modes, flavors):
        """Sum_terms coeff * prod_f op_f(mode_f); vectorised over terms.

        One preallocated (n_combos * t_count) block per call, combos
        written into slices in place — no per-combo temporaries and no
        wide concatenate at the end.
        """
        t_count = len(coeffs)
        if t_count == 0:
            return
        coeffs = np.asarray(coeffs, dtype=cdt)
        n_f = len(modes)
        n_combo = 2 ** n_f
        xblk = np.empty(n_combo * t_count, dtype=np.int64)
        zblk = np.empty(n_combo * t_count, dtype=np.int64)
        cblk = np.empty(n_combo * t_count, dtype=cdt)
        for combo in range(n_combo):
            sl = slice(combo * t_count, (combo + 1) * t_count)
            x_acc = np.zeros(t_count, dtype=np.int64)
            z_acc = np.zeros(t_count, dtype=np.int64)
            par = np.zeros(t_count, dtype=np.int64)
            scal = 1.0 + 0.0j
            for f in range(n_f):
                k = (combo >> f) & 1
                cS, tx, tz = (dc, dx, dz) if flavors[f] else (ac, ax, az)
                m = modes[f]
                par ^= _parity64(z_acc & tx[k][m])
                scal *= complex(cS[k])
                x_acc ^= tx[k][m]
                z_acc ^= tz[k][m]
            cc = cblk[sl]
            np.multiply(coeffs, scal.real if cdt == np.float64 else scal,
                        out=cc)
            np.negative(cc, out=cc, where=par.astype(bool))
            xblk[sl] = x_acc
            zblk[sl] = z_acc
        all_x.append(xblk)
        all_z.append(zblk)
        all_c.append(cblk)

    p1, q1 = np.nonzero(np.abs(h1) > tol)
    accumulate(h1[p1, q1], (p1, q1), (True, False))
    idx = np.nonzero(np.abs(h2) > tol)
    accumulate(h2[idx], idx, (True, True, False, False))

    if all_x:
        c_cat = np.concatenate(all_c) if len(all_c) > 1 else all_c[0]
        if n <= 31:
            # pack (x, z) into one int64 key: a single radix argsort beats
            # lexsort + double gather on multi-million-string registers
            def pack(x, z):
                k = np.left_shift(x, np.int64(32))
                np.bitwise_or(k, z, out=k)
                return k

            keys = (np.concatenate([pack(x, z) for x, z
                                    in zip(all_x, all_z)])
                    if len(all_x) > 1 else pack(all_x[0], all_z[0]))
            order = np.argsort(keys, kind="stable")
            keys_s = keys[order]
            cs_s = c_cat[order]
            boundary = np.ones(len(keys_s), dtype=bool)
            boundary[1:] = keys_s[1:] != keys_s[:-1]
            starts = np.nonzero(boundary)[0]
            sums = np.add.reduceat(cs_s, starts)
            keep = np.abs(sums) > tol
            kept = keys_s[starts][keep]
            xs_u = (kept >> np.int64(32)).tolist()
            zs_u = (kept & np.int64(0xFFFFFFFF)).tolist()
        else:
            x_cat = np.concatenate(all_x)
            z_cat = np.concatenate(all_z)
            order = np.lexsort((z_cat, x_cat))
            xs_s, zs_s, cs_s = x_cat[order], z_cat[order], c_cat[order]
            boundary = np.ones(len(xs_s), dtype=bool)
            boundary[1:] = (xs_s[1:] != xs_s[:-1]) | (zs_s[1:] != zs_s[:-1])
            starts = np.nonzero(boundary)[0]
            sums = np.add.reduceat(cs_s, starts)
            keep = np.abs(sums) > tol
            xs_u = xs_s[starts][keep].tolist()
            zs_u = zs_s[starts][keep].tolist()
        # bulk dict build (C-speed); the constant is summed in afterwards
        vals = sums[keep]
        if cdt == np.float64:
            vals = vals.astype(np.complex128)
        out.terms.update(zip(zip(xs_u, zs_u), vals.tolist()))
    out.add(complex(constant), 0, 0)
    return out.compress(tol)


def _map_python(out, h1, h2, dag, ann, tol):
    """Generic python-int path for > 63 qubits."""
    for p, q in zip(*np.nonzero(np.abs(h1) > tol)):
        c = complex(h1[p, q])
        for t1 in dag[p]:
            for t2 in ann[q]:
                cc, x, z = _mul(t1, t2)
                out.add(c * cc, x, z)
    for p, q, r, s in zip(*np.nonzero(np.abs(h2) > tol)):
        c = complex(h2[p, q, r, s])
        for t1 in dag[p]:
            for t2 in dag[q]:
                t12 = _mul(t1, t2)
                for t3 in ann[r]:
                    t123 = _mul(t12, t3)
                    for t4 in ann[s]:
                        cc, x, z = _mul(t123, t4)
                        out.add(c * cc, x, z)
    return out.compress(tol)


def jordan_wigner(constant, h1, h2, tol=1e-12) -> PauliSum:
    """JW-map an interaction operator ``(constant, h1, h2)`` to qubits."""
    return _map_interaction_operator(constant, h1, h2, "jw", tol)


def bravyi_kitaev(constant, h1, h2, tol=1e-12) -> PauliSum:
    """BK-map (Fenwick-tree construction) an interaction operator."""
    return _map_interaction_operator(constant, h1, h2, "bk", tol)


def parity_transform(constant, h1, h2, tol=1e-12) -> PauliSum:
    """Parity-encode an interaction operator (qubit j stores the mod-2
    particle count of modes 0..j).

    Number-parity conservation becomes the *single-qubit* symmetry
    Z_{n-1} — no term touches the last qubit with X or Y — so
    :func:`nbed_tpu.ham.taper` removes that qubit with a 1-sparse
    Clifford (the textbook "two-qubit reduction" is this plus the mid-
    register spin-parity qubit under blocked spin ordering)."""
    return _map_interaction_operator(constant, h1, h2, "parity", tol)


#: name -> transform, for config-driven mapping selection
MAPPINGS = {"jw": jordan_wigner, "bk": bravyi_kitaev,
            "parity": parity_transform}


def _term_arrays(psum: PauliSum):
    xs = np.array([k[0] for k in psum.terms], dtype=np.int64)
    zs = np.array([k[1] for k in psum.terms], dtype=np.int64)
    cs = np.array(list(psum.terms.values()), dtype=np.complex128)
    return xs, zs, cs


def _grouped_weights(psum: PauliSum):
    """Collapse the Pauli sum to one dense column-weight vector per distinct
    X mask.

    Every term ``c * X^x Z^z`` acts as a permutation matrix (col -> col ^ x)
    scaled by the diagonal sign ``(-1)^parity(col & z)``; all terms sharing an
    X mask share that permutation, so their diagonals sum into a single
    ``w_x[col]``.  The full matrix action is then ``out[col ^ x] += w_x * v``
    over the (few hundred) distinct masks instead of one pass per term —
    this is what makes the Lanczos oracle fast enough for the test suite.
    """
    n = psum.n_qubits
    dim = 1 << n
    xs, zs, cs = _term_arrays(psum)
    cols = np.arange(dim, dtype=np.int64)
    ux, inv = np.unique(xs, return_inverse=True)
    weights = np.zeros((len(ux), dim), dtype=np.complex128)
    for t in range(len(xs)):
        par = _parity_int64(cols & zs[t])
        weights[inv[t]] += cs[t] * (1.0 - 2.0 * par)
    return ux, weights, dim


def _parity_int64(arr):
    arr = arr.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        arr ^= arr >> shift
    return arr & 1


def measurement_groups(psum: PauliSum):
    """Partition the Pauli sum into qubit-wise-commuting (QWC) groups.

    Each group can be measured in one circuit execution (a single
    per-qubit basis rotation), so ``len(groups)`` — not the raw term
    count — is what sets the measurement cost of estimating ⟨H⟩ on a
    quantum device.  Complements the qubit/term-count reduction metrics
    the reference's publication reports (PRA 109, 022418 table; the
    reference itself leaves grouping to external SDKs).

    Greedy first-fit over terms sorted by |coefficient| (heavy terms
    seed groups).  Because members of a group are mutually QWC, the
    group is summarised by the OR of its X and Z masks; a term fits iff
    on every qubit where both act, the (X, Z) bit pattern agrees:
    ``common = (tx|tz) & (gx|gz);  tx&common == gx&common  and
    tz&common == gz&common``.  The scan over groups is vectorised in
    int64 numpy, so paper-scale sums (~50k terms) group in seconds.

    Returns:
        list of groups, each a list of ``((x, z), coeff)`` items; the
        identity term (if present) joins the first group it fits.
    """
    items = sorted(psum.terms.items(), key=lambda kv: -abs(kv[1]))
    if not items:
        return []
    membership = []  # term index -> group index
    if psum.n_qubits <= 63:
        gx = np.zeros(0, dtype=np.int64)
        gz = np.zeros(0, dtype=np.int64)
        for (x, z), _ in items:
            act = x | z
            common = act & (gx | gz)
            fits = ((x & common) == (gx & common)) \
                & ((z & common) == (gz & common))
            hit = np.nonzero(fits)[0]
            if hit.size:
                g = int(hit[0])
                gx[g] |= x
                gz[g] |= z
            else:
                g = len(gx)
                gx = np.append(gx, np.int64(x))
                gz = np.append(gz, np.int64(z))
            membership.append(g)
        n_groups = len(gx)
    else:  # arbitrary-width python-int masks
        gx_l, gz_l = [], []
        for (x, z), _ in items:
            for g, (mx, mz) in enumerate(zip(gx_l, gz_l)):
                common = (x | z) & (mx | mz)
                if (x & common) == (mx & common) \
                        and (z & common) == (mz & common):
                    gx_l[g] |= x
                    gz_l[g] |= z
                    membership.append(g)
                    break
            else:
                membership.append(len(gx_l))
                gx_l.append(x)
                gz_l.append(z)
        n_groups = len(gx_l)
    groups = [[] for _ in range(n_groups)]
    for (key_coeff, g) in zip(items, membership):
        groups[g].append(key_coeff)
    return groups


def pauli_sum_to_sparse(psum: PauliSum):
    """Explicit CSR matrix (use only for small qubit counts)."""
    from scipy.sparse import coo_matrix

    ux, weights, dim = _grouped_weights(psum)
    cols = np.arange(dim, dtype=np.int64)
    rows = (cols[None, :] ^ ux[:, None]).ravel()
    return coo_matrix(
        (weights.ravel(), (rows, np.tile(cols, len(ux)))),
        shape=(dim, dim),
    ).tocsr()


# nnz budget for materialising the CSR in pauli_ground_state (~3 GB at
# complex128 + two int64 index arrays); beyond it, stay matrix-free.
_SPARSE_NNZ_LIMIT = 100_000_000


def pauli_ground_state(psum: PauliSum, k: int = 1):
    """Lowest-k eigenvalues of the Pauli sum.

    Small systems get an explicit CSR + Lanczos (fastest); large ones fall
    back to a matrix-free operator built from the X-mask-grouped weights so
    storage stays O(n_distinct_x * 2^n) worst case, never the full matrix.
    """
    dim = 1 << psum.n_qubits
    xs, zs, cs = _term_arrays(psum)
    n_ux = len(np.unique(xs))
    if n_ux * dim <= _SPARSE_NNZ_LIMIT:
        mat = pauli_sum_to_sparse(psum)
        vals = eigsh(mat, k=k, which="SA", return_eigenvectors=False)
        return np.sort(vals)

    # Stream term-by-term: O(dim) memory, one pass per term per matvec.
    cols = np.arange(dim, dtype=np.int64)

    def matvec(v):
        out = np.zeros(dim, dtype=np.complex128)
        for x, z, c in zip(xs, zs, cs):
            par = _parity_int64(cols & z)
            out[cols ^ x] += c * (1.0 - 2.0 * par) * v
        return out

    op = LinearOperator((dim, dim), matvec=matvec, dtype=np.complex128)
    vals = eigsh(op, k=k, which="SA", return_eigenvectors=False)
    return np.sort(vals)
