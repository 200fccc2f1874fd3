"""Batched multi-limb Montgomery field arithmetic for TPU (JAX/XLA).

Field elements are `(..., 16)` uint32 arrays holding 16 little-endian 16-bit
limbs in Montgomery form (radix R = 2^256). All ops are branchless and
elementwise over arbitrary leading batch dims, so XLA vectorizes them over the
VPU and `vmap`/`shard_map` distribute them over chips.

Why 16-bit limbs: for 16-bit a,b,c,d the value a*b + c + d < 2^32 exactly, so
every partial-product/carry step fits u32 with no overflow — the TPU VPU's
native integer width. This replaces arkworks' x86-64 asm field arithmetic
(the reference's only native acceleration, see
/root/reference/distributed-prover/Cargo.toml:79).

Design: separated (non-interleaved) Montgomery REDC — full 512-bit product by
column accumulation (high parallelism, one short carry chain) rather than the
CPU-style fully-sequential CIOS loop, because the VPU wants wide independent
ops, not long dependency chains.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bn254 import (
    LIMB_BITS,
    LIMB_MASK,
    NLIMBS,
    P,
    R,
    from_limbs,
    to_limbs,
)

u32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


class FieldSpec:
    """Static per-modulus data: limb-encoded modulus and Montgomery constants.

    nlimbs parametrizes the 16-bit limb count (16 for 254/255-bit moduli,
    24 for BLS12-381's 381-bit base field)."""

    def __init__(self, modulus: int, name: str, nlimbs: int = NLIMBS):
        self.modulus = modulus
        self.name = name
        self.nlimbs = nlimbs
        self.mont_r = 1 << (LIMB_BITS * nlimbs)
        r_mod = self.mont_r % modulus
        r2_mod = (self.mont_r * self.mont_r) % modulus
        ninv = (-pow(modulus, -1, self.mont_r)) % self.mont_r
        self.r_mod = r_mod
        self.r2_mod = r2_mod
        self.ninv = ninv
        self.p_limbs = np.array(to_limbs(modulus, nlimbs), dtype=np.uint32)
        self.ninv_limbs = np.array(to_limbs(ninv, nlimbs), dtype=np.uint32)
        self.one_mont = np.array(to_limbs(r_mod, nlimbs), dtype=np.uint32)
        self.zero = np.zeros(nlimbs, dtype=np.uint32)
        # bits of modulus-2, LSB first, for Fermat inversion / fixed pow
        self.inv_exp_bits = np.array(
            [(modulus - 2) >> i & 1 for i in range((modulus - 2).bit_length())],
            dtype=np.uint32,
        )

    # -- host <-> device packing ------------------------------------------------
    def to_mont(self, x: int) -> int:
        return (x % self.modulus) * self.mont_r % self.modulus

    @property
    def mont_rinv(self) -> int:
        inv = getattr(self, "_mont_rinv", None)
        if inv is None:
            inv = self._mont_rinv = pow(self.mont_r, -1, self.modulus)
        return inv

    def from_mont(self, x: int) -> int:
        return x * self.mont_rinv % self.modulus

    def pack(self, xs, mont: bool = True) -> np.ndarray:
        """ints -> (n, 16) uint32 limb array (Montgomery form by default).

        Limb splitting goes through int.to_bytes + one frombuffer view (the
        per-element 16-shift loop was a canonical-scale hotspot: 2M-element
        eval/scalar arrays are packed on every prove)."""
        m, r = self.modulus, self.mont_r
        nb = self.nlimbs * 2
        if mont:
            buf = b"".join(((x % m) * r % m).to_bytes(nb, "little") for x in xs)
        else:
            buf = b"".join((x % m).to_bytes(nb, "little") for x in xs)
        arr = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
        return arr.reshape(len(xs), self.nlimbs)

    def unpack(self, arr, mont: bool = True) -> list:
        arr = np.ascontiguousarray(np.asarray(arr).reshape(-1, self.nlimbs))
        if arr.dtype != np.uint32 or (arr >> 16).any():
            # non-canonical limbs (>16 bits): slow exact path
            out = []
            for row in arr:
                v = from_limbs(row)
                out.append(self.from_mont(v) if mont else v % self.modulus)
            return out
        b = arr.astype("<u2").tobytes()
        nb = self.nlimbs * 2
        m = self.modulus
        vals = [
            int.from_bytes(b[i * nb : (i + 1) * nb], "little") for i in range(arr.shape[0])
        ]
        if mont:
            rinv = self.mont_rinv
            return [v * rinv % m for v in vals]
        return [v % m for v in vals]


FQ = FieldSpec(P, "fq")
FR = FieldSpec(R, "fr")


# ---------------------------------------------------------------------------
# limb primitives
# ---------------------------------------------------------------------------


_POW2_16 = (np.uint32(1) << np.arange(16, dtype=np.uint32)).astype(np.uint32)


def _lookahead_chunk(g, p, carry_in):
    """Resolve a <=16-limb carry/borrow chain c_{k+1} = g_k | (p_k & c_k).

    The generate/propagate bits are packed into one u32 per element and the
    whole chain is solved with the classic adder identity
    carries = (A+B) ^ A ^ B where A = G|P, B = G — O(1) ops instead of a
    sequential 16-step loop. Returns (carries (..., W), carry_out (...,)).
    """
    W = g.shape[-1]
    pw = jnp.asarray(_POW2_16[:W])
    G = jnp.sum(g * pw, axis=-1, dtype=u32)
    Pp = jnp.sum(p * pw, axis=-1, dtype=u32)
    # seed the incoming carry: it enters limb 0's recurrence like a generate
    # at a virtual limb: equivalently add it to the packed sum at bit 0.
    A = G | Pp
    S = A + G + carry_in
    C = S ^ A ^ G  # bit k = carry INTO limb k (bit 0 reflects carry_in)
    c = (C[..., None] >> jnp.arange(W, dtype=u32)) & 1
    carry_out = (S >> W) & 1
    return c, carry_out


def _canon(cols):
    """Exact canonicalization of limb columns (values < 2^21) to 16-bit limbs.

    Drops any overflow beyond the given width — callers guarantee the true
    value fits (all uses are bounded: products < 2^512 in 32 limbs, modular
    sums < 2^256 in 16 limbs).
    """
    W = cols.shape[-1]
    v = cols & MASK
    h = cols >> LIMB_BITS  # < 2^5
    shifted = jnp.concatenate([jnp.zeros_like(h[..., :1]), h[..., :-1]], axis=-1)
    v2 = v + shifted  # <= 2^16 + 30: generate/propagate disjoint
    g = v2 >> LIMB_BITS
    r = v2 & MASK
    p = (r == MASK).astype(u32)
    outs = []
    carry = jnp.zeros(v2.shape[:-1], u32)
    for s in range(0, W, 16):
        e = min(s + 16, W)
        c, carry = _lookahead_chunk(g[..., s:e], p[..., s:e], carry)
        outs.append((r[..., s:e] + c) & MASK)
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


# Constant gather indices mapping partial-product diagonals to columns
# (the CPU path — XLA:CPU vectorizes these gathers well, and the shifted-row
# formulation below is ~7x slower there; on TPU it is the reverse, ~1000x).
@functools.lru_cache(maxsize=None)
def _diag_index(nl, ncols, shift):
    idx = np.zeros((nl, ncols), dtype=np.int32)
    for i in range(nl):
        for k in range(ncols):
            j = k - i - shift
            idx[i, k] = j if 0 <= j < nl else nl  # nl -> zero pad slot
    return idx


def _mul_columns_gather(a, b, ncols):
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16) u32, exact
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    zpad = jnp.zeros_like(lo[..., :1])
    lo = jnp.concatenate([lo, zpad], axis=-1)  # (..., 16, 17)
    hi = jnp.concatenate([hi, zpad], axis=-1)
    nl = a.shape[-1]
    ilo = jnp.broadcast_to(jnp.asarray(_diag_index(nl, ncols, 0)), lo.shape[:-1] + (ncols,))
    ihi = jnp.broadcast_to(jnp.asarray(_diag_index(nl, ncols, 1)), hi.shape[:-1] + (ncols,))
    cols = jnp.sum(jnp.take_along_axis(lo, ilo, axis=-1), axis=-2, dtype=u32)
    cols = cols + jnp.sum(jnp.take_along_axis(hi, ihi, axis=-1), axis=-2, dtype=u32)
    return cols  # values <= 32 * (2^16 - 1) < 2^21


def _mul_columns(a, b, ncols):
    """Column sums of the schoolbook product; backend-dispatched at trace time."""
    if jax.default_backend() == "cpu":
        return _mul_columns_gather(a, b, ncols)
    return _mul_columns_shift(a, b, ncols)


def _mul_columns_shift(a, b, ncols):
    """Gather-free column sums for TPU.

    cols[k] = sum_{i+j=k} lo16(a_i*b_j) + sum_{i+j=k-1} hi16(a_i*b_j).
    Each partial row is placed at its static column offset by zero-padding
    (pure concatenation — XLA fuses the stack+sum into dense VPU work; the
    take_along_axis formulation lowers to per-element gathers on TPU and
    was ~100x slower there, and faulted the device watchdog).
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    nl = a.shape[-1]
    rows = []
    for i in range(nl):
        prod = a[..., i : i + 1] * b  # (..., 16) u32, exact (16x16-bit)
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        # lo contributes at columns [i, i+16), hi at [i+1, i+17)
        if i < ncols:
            w = min(nl, ncols - i)
            rows.append(
                jnp.concatenate(
                    [jnp.zeros(shape + (i,), u32), lo[..., :w],
                     jnp.zeros(shape + (ncols - i - w,), u32)],
                    axis=-1,
                )
            )
        if i + 1 < ncols:
            w = min(nl, ncols - i - 1)
            rows.append(
                jnp.concatenate(
                    [jnp.zeros(shape + (i + 1,), u32), hi[..., :w],
                     jnp.zeros(shape + (ncols - i - 1 - w,), u32)],
                    axis=-1,
                )
            )
    return jnp.sum(jnp.stack(rows, axis=0), axis=0, dtype=u32)  # < 2^21


def _mul_wide(a, b_limbs):
    """Full 256x256 -> 512-bit product as (..., 32) canonical 16-bit limbs."""
    b = jnp.asarray(b_limbs, u32)
    if b.ndim == 1:
        b = jnp.broadcast_to(b, a.shape)
    a, b = jnp.broadcast_arrays(a, b)
    return _canon(_mul_columns(a, b, 2 * a.shape[-1]))


def _mul_low(a, b_limbs):
    """Low 256 bits of a*b as (..., 16) canonical limbs (mod 2^256)."""
    b = jnp.asarray(b_limbs, u32)
    if b.ndim == 1:
        b = jnp.broadcast_to(b, a.shape)
    a, b = jnp.broadcast_arrays(a, b)
    return _canon(_mul_columns(a, b, a.shape[-1]))


def _add_limbs(a, b):
    """(a + b) over equal-width canonical limb arrays; drops final carry-out.

    Safe only when the true sum fits the limb count (callers guarantee it).
    """
    a, b = jnp.broadcast_arrays(a, b)
    return _canon(a + b)


def _sub_limbs(a, b):
    """a - b with borrow-out: returns (diff limbs, borrow in {0,1})."""
    a, b = jnp.broadcast_arrays(a, b)
    W = a.shape[-1]
    g = (a < b).astype(u32)
    p = (a == b).astype(u32)
    outs = []
    borrow = jnp.zeros(a.shape[:-1], u32)
    for s in range(0, W, 16):
        e = min(s + 16, W)
        c, borrow = _lookahead_chunk(g[..., s:e], p[..., s:e], borrow)
        outs.append((a[..., s:e] - b[..., s:e] - c) & MASK)
    diff = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return diff, borrow


def _cond_sub_mod(x, p_limbs):
    """x mod p for x < 2p: one conditional subtraction."""
    d, borrow = _sub_limbs(x, jnp.asarray(p_limbs, u32))
    return jnp.where((borrow == 0)[..., None], d, x)


# ---------------------------------------------------------------------------
# Modular ops, parametrized by FieldSpec
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a, b):
    return _cond_sub_mod(_add_limbs(a, b), spec.p_limbs)


def sub(spec: FieldSpec, a, b):
    d, borrow = _sub_limbs(a, b)
    fixed = _add_limbs(d, jnp.broadcast_to(jnp.asarray(spec.p_limbs, u32), d.shape))
    return jnp.where((borrow == 1)[..., None], fixed, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product abR^{-1} mod p (REDC).

    Carry canonicalization is deferred: t = a*b and m*p are kept as raw
    column sums (< 2^22 per column, within _canon's tolerance) and summed
    BEFORE the single full canon — 2 canons total instead of 4. This
    halves-ish the traced graph per multiply (the canon carry network is
    the largest component), which directly cuts XLA compile latency of
    every field-heavy program.
    """
    nl = spec.nlimbs
    ncols = 2 * nl
    b_arr = jnp.asarray(b, u32)
    if b_arr.ndim == 1:
        b_arr = jnp.broadcast_to(b_arr, a.shape)
    a, b_arr = jnp.broadcast_arrays(a, b_arr)
    t_cols = _mul_columns(a, b_arr, ncols)  # raw column sums < 2^21
    # t mod 2^(16*nl): columns k < nl only (carries go upward; dropped
    # overflow == the mod)
    t_low = _canon(t_cols[..., :nl])
    ninv = jnp.broadcast_to(jnp.asarray(spec.ninv_limbs, u32), t_low.shape)
    m = _canon(_mul_columns(t_low, ninv, nl))
    p_b = jnp.broadcast_to(jnp.asarray(spec.p_limbs, u32), m.shape)
    mp_cols = _mul_columns(m, p_b, ncols)
    s = _canon(t_cols + mp_cols)  # t + m*p < 2p*R: fits 2*nl limbs exactly
    return _cond_sub_mod(s[..., nl:], spec.p_limbs)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def is_zero(spec: FieldSpec, a):
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond: (...,) bool; a, b field arrays with matching batch dims."""
    extra = a.ndim - cond.ndim
    return jnp.where(cond.reshape(cond.shape + (1,) * extra), a, b)


def mont_inv(spec: FieldSpec, a):
    """Batched Fermat inversion a^(p-2); inv(0) = 0. Branchless, fori_loop."""
    bits = jnp.asarray(spec.inv_exp_bits)

    def body(i, carry):
        acc, base = carry
        mul = mont_mul(spec, acc, base)
        acc = select(bits[i] == 1, mul, acc)
        base = mont_sqr(spec, base)
        return acc, base

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, u32), a.shape)
    acc, _ = jax.lax.fori_loop(0, bits.shape[0], body, (one, a))
    return select(is_zero(spec, a), jnp.zeros_like(a), acc)


def batch_inv(spec: FieldSpec, a, pallas_min: int = 2048):
    """Simultaneous inversion of a batch via a binary product tree:
    ~3 multiplies per element + ONE Fermat inversion at the root
    (Montgomery's trick, log-depth form for a vector machine).

    a: (..., nlimbs) nonzero Montgomery elements — callers must mask
    degenerate lanes to 1 first (inv(0) = 0 is NOT preserved here, unlike
    mont_inv). Large levels dispatch to the fused Pallas CIOS kernel on TPU;
    small levels and other backends use the XLA formulas.
    """
    shape = a.shape
    nl = spec.nlimbs
    a2 = a.reshape(-1, nl)
    M = a2.shape[0]
    Mp = 1 << max(0, (M - 1).bit_length())
    if Mp > M:
        ones = jnp.broadcast_to(jnp.asarray(spec.one_mont, u32), (Mp - M, nl))
        a2 = jnp.concatenate([a2, ones])

    use_pallas = _pallas_available()  # the CIOS/Fermat kernels are limb-count-generic

    def mul(x, y):
        if use_pallas and x.shape[0] >= pallas_min:
            from .pallas_field import mont_mul_pallas

            return mont_mul_pallas(spec, x, y)
        return mont_mul(spec, x, y)

    # with the fused in-kernel Fermat available, stop the tree once the
    # remainder fits one kernel block — the XLA-loop Fermat at width 1 costs
    # ~254 fori iterations of tiny ops, far more than one fused sweep
    stop = 1024 if use_pallas else 1
    levels = []
    cur = a2
    while cur.shape[0] > stop:
        lo, hi = cur[0::2], cur[1::2]
        levels.append((lo, hi))
        cur = mul(lo, hi)
    if use_pallas:
        from .pallas_field import fermat_inv_pallas

        inv = fermat_inv_pallas(spec, cur)
    else:
        inv = mont_inv(spec, cur)
    for lo, hi in reversed(levels):
        ilo = mul(inv, hi)
        ihi = mul(inv, lo)
        k = lo.shape[0]
        inv = jnp.stack([ilo, ihi], axis=1).reshape(2 * k, nl)
    return inv[:M].reshape(shape)


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def mont_pow_const(spec: FieldSpec, a, exponent: int):
    """a^exponent for a static exponent (device, branchless)."""
    ebits = jnp.asarray(
        np.array([(exponent >> i) & 1 for i in range(max(exponent.bit_length(), 1))], np.uint32)
    )

    def body(i, carry):
        acc, base = carry
        acc = select(ebits[i] == 1, mont_mul(spec, acc, base), acc)
        return acc, mont_sqr(spec, base)

    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, u32), a.shape)
    acc, _ = jax.lax.fori_loop(0, ebits.shape[0], body, (one, a))
    return acc


# ---------------------------------------------------------------------------
# Fq2 = Fq[u]/(u^2+1): shape (..., 2, 16)
# ---------------------------------------------------------------------------


def fq2_add(a, b):
    return add(FQ, a, b)  # broadcasting handles the extra (2,) dim


def fq2_sub(a, b):
    return sub(FQ, a, b)


def fq2_neg(a):
    return neg(FQ, a)


def fq2_mul(a, b):
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    t0 = mont_mul(FQ, a0, b0)
    t1 = mont_mul(FQ, a1, b1)
    c0 = sub(FQ, t0, t1)
    s = mont_mul(FQ, add(FQ, a0, a1), add(FQ, b0, b1))
    c1 = sub(FQ, sub(FQ, s, t0), t1)
    return jnp.stack([c0, c1], axis=-2)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2))


def fq2_eq(a, b):
    return jnp.all(a == b, axis=(-1, -2))


# ---------------------------------------------------------------------------
# Generic field-ops namespaces (the curve layer is templated on these;
# G1 instantiates over Fq, G2 over Fq2 — same Jacobian formulas)
# ---------------------------------------------------------------------------


def make_fp_ops(spec: FieldSpec):
    """Generic prime-field ops namespace over a FieldSpec (any limb count) —
    the CurveOps field-adapter interface (curves/jax_curve.py:34)."""

    class _Ops:
        ndim = 1

        add = staticmethod(lambda a, b: add(spec, a, b))
        sub = staticmethod(lambda a, b: sub(spec, a, b))
        neg = staticmethod(lambda a: neg(spec, a))
        mul = staticmethod(lambda a, b: mont_mul(spec, a, b))
        sqr = staticmethod(lambda a: mont_sqr(spec, a))
        is_zero = staticmethod(lambda a: is_zero(spec, a))
        eq = staticmethod(lambda a, b: eq(spec, a, b))

        @staticmethod
        def select(cond, a, b):
            return select(cond, a, b)

        @staticmethod
        def zeros(batch_shape):
            return jnp.zeros(batch_shape + (spec.nlimbs,), u32)

        @staticmethod
        def one(batch_shape):
            return jnp.broadcast_to(
                jnp.asarray(spec.one_mont, u32), batch_shape + (spec.nlimbs,)
            )

        @staticmethod
        def pack(vals) -> np.ndarray:
            return spec.pack(vals)

        @staticmethod
        def unpack(arr):
            return spec.unpack(arr)

    _Ops.spec = spec
    return _Ops


class FqOps:
    """Fq ops namespace: elements are (..., 16) uint32."""

    ndim = 1
    spec = FQ

    add = staticmethod(lambda a, b: add(FQ, a, b))
    sub = staticmethod(lambda a, b: sub(FQ, a, b))
    neg = staticmethod(lambda a: neg(FQ, a))
    mul = staticmethod(lambda a, b: mont_mul(FQ, a, b))
    sqr = staticmethod(lambda a: mont_sqr(FQ, a))
    is_zero = staticmethod(lambda a: is_zero(FQ, a))
    eq = staticmethod(lambda a, b: eq(FQ, a, b))

    @staticmethod
    def select(cond, a, b):
        return select(cond, a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (NLIMBS,), u32)

    @staticmethod
    def one(batch_shape):
        return jnp.broadcast_to(jnp.asarray(FQ.one_mont, u32), batch_shape + (NLIMBS,))

    # host packing for points
    @staticmethod
    def pack(vals) -> np.ndarray:
        return FQ.pack(vals)

    @staticmethod
    def unpack(arr):
        return FQ.unpack(arr)


class Fq2Ops:
    """Fq2 ops namespace: elements are (..., 2, 16) uint32."""

    ndim = 2
    spec = FQ

    add = staticmethod(fq2_add)
    sub = staticmethod(fq2_sub)
    neg = staticmethod(fq2_neg)
    mul = staticmethod(fq2_mul)
    sqr = staticmethod(fq2_sqr)
    is_zero = staticmethod(fq2_is_zero)
    eq = staticmethod(fq2_eq)

    @staticmethod
    def select(cond, a, b):
        extra = a.ndim - cond.ndim
        return jnp.where(cond.reshape(cond.shape + (1,) * extra), a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (2, NLIMBS), u32)

    @staticmethod
    def one(batch_shape):
        one = np.zeros((2, NLIMBS), np.uint32)
        one[0] = FQ.one_mont
        return jnp.broadcast_to(jnp.asarray(one), batch_shape + (2, NLIMBS))

    @staticmethod
    def pack(vals) -> np.ndarray:
        """vals: list of host Fq2 -> (n, 2, 16) uint32 (Montgomery).
        Vectorized through FieldSpec.pack on the two component lists (the
        per-element loop was a canonical-scale hotspot: G2 CRS chunks pack
        ~1M coordinates per chunk)."""
        c0 = FQ.pack([v.c0 for v in vals])
        c1 = FQ.pack([v.c1 for v in vals])
        return np.stack([c0, c1], axis=1)

    @staticmethod
    def unpack(arr):
        from .host import Fq2 as HostFq2

        arr = np.asarray(arr).reshape(-1, 2, NLIMBS)
        return [
            HostFq2(FQ.from_mont(from_limbs(row[0])), FQ.from_mont(from_limbs(row[1])))
            for row in arr
        ]


# Fr ops (scalar field) — used by the NTT and witness algebra.
class FrOps:
    ndim = 1
    spec = FR

    add = staticmethod(lambda a, b: add(FR, a, b))
    sub = staticmethod(lambda a, b: sub(FR, a, b))
    neg = staticmethod(lambda a: neg(FR, a))
    mul = staticmethod(lambda a, b: mont_mul(FR, a, b))
    sqr = staticmethod(lambda a: mont_sqr(FR, a))
    is_zero = staticmethod(lambda a: is_zero(FR, a))
    eq = staticmethod(lambda a, b: eq(FR, a, b))
    select = staticmethod(select)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (NLIMBS,), u32)

    @staticmethod
    def one(batch_shape):
        return jnp.broadcast_to(jnp.asarray(FR.one_mont, u32), batch_shape + (NLIMBS,))

    @staticmethod
    def pack(vals) -> np.ndarray:
        return FR.pack(vals)

    @staticmethod
    def unpack(arr):
        return FR.unpack(arr)
