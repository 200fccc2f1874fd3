"""Radix-2 NTT over BN254-Fr on TPU, with four-step factorization.

Replaces arkworks' `GeneralEvaluationDomain` FFTs (QAP instance/witness maps —
/root/reference/cp-groth16/src/generator.rs:75, prover.rs:123). Fr supports
domains up to 2^28 (r - 1 = 2^28 * odd).

Design: sizes <= 256 use an unrolled iterative Cooley-Tukey (8 traced stages,
each one batched Montgomery mul + add/sub — tiny HLO); larger sizes use the
four-step split N = N1*N2 (column NTTs, twiddle matrix, row NTTs, transpose),
which XLA maps to batched elementwise ops + transposes and which shards
naturally over a mesh axis (column/row NTTs are embarrassingly batch-parallel;
the transpose is the all-to-all — SURVEY.md §2.5 P4).

All data is (..., n, 16) uint32, Montgomery form. Plans (twiddle tables) are
host-precomputed per domain size and cached.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf
from ..fields.bn254 import FR_TWO_ADIC_ROOT, NLIMBS, R, TWO_ADICITY
from ..fields.host import fr_batch_inv, fr_inv

BASE = 256


def root_of_unity(n: int) -> int:
    assert n & (n - 1) == 0 and n <= (1 << TWO_ADICITY)
    return pow(FR_TWO_ADIC_ROOT, (1 << TWO_ADICITY) // n, R)


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for i in range(n):
        b = 0
        x = i
        for _ in range(bits):
            b = (b << 1) | (x & 1)
            x >>= 1
        rev[i] = b
    return rev


class _BasePlan:
    def __init__(self, n: int, omega: int):
        self.n = n
        self.perm = _bitrev_perm(n)
        self.stage_tw = []
        m = 1
        while m < n:
            w = pow(omega, n // (2 * m), R)  # primitive 2m-th root
            tws = [pow(w, j, R) for j in range(m)]
            self.stage_tw.append(jf.FR.pack(tws))
            m *= 2

    def consts(self):
        """Twiddle/permutation arrays as a pytree, so big-n callers can pass
        them as jit ARGUMENTS instead of closure constants — closure-captured
        arrays are inlined into the HLO as literals, and at n=2^21 the
        embedded tables (134 MB cross twiddles alone) exceeded the remote
        compile tunnel's request-size limit (HTTP 413)."""
        return {"perm": self.perm.astype(np.int32), "tw": list(self.stage_tw)}

    def apply(self, x, consts=None):
        n = self.n
        batch = x.shape[:-2]
        perm = self.perm if consts is None else consts["perm"]
        tw = self.stage_tw if consts is None else consts["tw"]
        x = x[..., perm, :]
        m = 1
        while m < n:
            twj = jnp.asarray(tw[(m).bit_length() - 1])
            x = x.reshape(batch + (n // (2 * m), 2, m, NLIMBS))
            e = x[..., 0, :, :]
            o = jf.mont_mul(jf.FR, x[..., 1, :, :], twj)
            x = jnp.concatenate(
                [jf.add(jf.FR, e, o)[..., None, :, :], jf.sub(jf.FR, e, o)[..., None, :, :]],
                axis=-3,
            )
            x = x.reshape(batch + (n, NLIMBS))
            m *= 2
        return x


class _SplitPlan:
    def __init__(self, n: int, omega: int):
        self.n = n
        bits = n.bit_length() - 1
        n1 = 1 << ((bits + 1) // 2)
        n2 = n // n1
        self.n1, self.n2 = n1, n2
        self.sub1 = _make_plan(n1, pow(omega, n2, R))
        self.sub2 = _make_plan(n2, pow(omega, n1, R))
        # cross twiddles w^{k1*n2'}: tw[k1, j2] = omega^{k1*j2}
        col = np.array([pow(omega, k1, R) for k1 in range(n1)], dtype=object)
        rows = []
        for k1 in range(n1):
            wk = int(col[k1])
            row = [1] * n2
            cur = 1
            for j2 in range(n2):
                row[j2] = cur
                cur = cur * wk % R
            rows.append(row)
        flat = [v for row in rows for v in row]
        self.cross = jf.FR.pack(flat).reshape(n1, n2, NLIMBS)

    def consts(self):
        """See _BasePlan.consts — nested pytree for the recursive structure."""
        return {
            "sub1": self.sub1.consts(),
            "sub2": self.sub2.consts(),
            "cross": self.cross,
        }

    def apply(self, x, consts=None):
        n1, n2 = self.n1, self.n2
        batch = x.shape[:-2]
        cross = self.cross if consts is None else consts["cross"]
        c1 = None if consts is None else consts["sub1"]
        c2 = None if consts is None else consts["sub2"]
        x = x.reshape(batch + (n1, n2, NLIMBS))
        # column NTTs (size n1, batched over n2): operate on axis -3
        xt = jnp.swapaxes(x, -3, -2)  # (..., n2, n1, 16)
        a = self.sub1.apply(xt, c1)
        a = jnp.swapaxes(a.reshape(batch + (n2, n1, NLIMBS)), -3, -2)  # (..., n1, n2, 16)
        t = jf.mont_mul(jf.FR, a, jnp.asarray(cross))
        b = self.sub2.apply(t, c2)  # row NTTs over n2 axis
        b = b.reshape(batch + (n1, n2, NLIMBS))
        out = jnp.swapaxes(b, -3, -2)  # X[k1 + n1*k2] = B[k1,k2]
        return out.reshape(batch + (self.n, NLIMBS))


@functools.lru_cache(maxsize=None)
def _make_plan(n: int, omega: int):
    return _BasePlan(n, omega) if n <= BASE else _SplitPlan(n, omega)


@functools.lru_cache(maxsize=None)
def _inv_scale(n: int):
    return jf.FR.pack([fr_inv(n)])[0]  # numpy; converted per-trace at use site


@functools.lru_cache(maxsize=None)
def _coset_pows(n: int, g: int, inverse: bool):
    gg = fr_inv(g) if inverse else g
    pows = [1] * n
    cur = 1
    for i in range(n):
        pows[i] = cur
        cur = cur * gg % R
    return jf.FR.pack(pows)  # numpy; converted per-trace at use site


def ntt(x, inverse: bool = False, consts=None):
    """Forward/inverse NTT over the size-n subgroup domain; natural order.

    `consts`: optional pytree from ntt_consts(n, inverse) passed through a
    jit boundary as arguments — required at big n so the twiddle tables are
    runtime inputs instead of HLO literal constants (see _BasePlan.consts)."""
    n = x.shape[-2]
    omega = root_of_unity(n)
    if inverse:
        omega = fr_inv(omega)
    plan = _make_plan(n, omega)
    out = plan.apply(x, consts)
    if inverse:
        out = jf.mont_mul(jf.FR, out, jnp.asarray(_inv_scale(n)))
    return out


def ntt_consts(n: int, inverse: bool = False):
    """Twiddle/permutation pytree (numpy arrays) for ntt(x, inverse, consts)."""
    omega = root_of_unity(n)
    if inverse:
        omega = fr_inv(omega)
    return _make_plan(n, omega).consts()


# Default coset generator: the Fr multiplicative generator candidate 5 works
# (any element outside the 2^28 subgroup does; verified in tests by roundtrip).
COSET_GEN = 5


def coset_ntt(x, g: int = COSET_GEN, consts=None):
    """Evaluations of the polynomial (coeff form x) over the coset g*H.

    `consts`: optional {"pows": ..., "ntt": ...} pytree from
    coset_consts(n, g, False), passed as jit arguments at big n."""
    n = x.shape[-2]
    pows = _coset_pows(n, g, False) if consts is None else consts["pows"]
    scaled = jf.mont_mul(jf.FR, x, jnp.asarray(pows))
    return ntt(scaled, consts=None if consts is None else consts["ntt"])


def coset_intt(x, g: int = COSET_GEN, consts=None):
    n = x.shape[-2]
    coeffs = ntt(x, inverse=True, consts=None if consts is None else consts["ntt"])
    pows = _coset_pows(n, g, True) if consts is None else consts["pows"]
    return jf.mont_mul(jf.FR, coeffs, jnp.asarray(pows))


def coset_consts(n: int, g: int = COSET_GEN, inverse: bool = False):
    """Consts pytree for coset_ntt (inverse=False) / coset_intt (True)."""
    return {"pows": _coset_pows(n, g, inverse), "ntt": ntt_consts(n, inverse)}


# ---------------------------------------------------------------------------
# Host-side domain utilities (setup-time polynomial algebra)
# ---------------------------------------------------------------------------


class Domain:
    """Host-side multiplicative subgroup domain of size n (power of two)."""

    def __init__(self, n: int):
        size = 1
        while size < n:
            size <<= 1
        self.n = size
        self.omega = root_of_unity(size)
        self.omega_inv = fr_inv(self.omega)

    def vanishing_at(self, t: int) -> int:
        return (pow(t, self.n, R) - 1) % R

    def lagrange_coeffs_at(self, t: int) -> list:
        """[L_i(t)] for all i: Z(t) * w^i / (n * (t - w^i)) — batch-inverted."""
        z = self.vanishing_at(t)
        pows = [1] * self.n
        for i in range(1, self.n):
            pows[i] = pows[i - 1] * self.omega % R
        denoms = [(t - w) % R for w in pows]
        if any(d == 0 for d in denoms):
            # t in the domain: L_i(t) = delta_{t == w^i}
            return [1 if d == 0 else 0 for d in denoms]
        invs = fr_batch_inv(denoms)
        ninv = fr_inv(self.n)
        return [z * w % R * inv % R * ninv % R for w, inv in zip(pows, invs)]

    def elements(self) -> list:
        pows = [1] * self.n
        for i in range(1, self.n):
            pows[i] = pows[i - 1] * self.omega % R
        return pows
