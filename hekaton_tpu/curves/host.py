"""Host-side BN254 G1/G2 affine group operations (Python ints / Fq2).

Ground truth for the TPU Jacobian kernels and the small, latency-bound group
work (generators, verifier-side points, TIPA bookkeeping). G1 points live over
Fq (plain ints), G2 points over Fq2; both are `(x, y)` tuples with `None` as
the point at infinity. Mirrors the role arkworks' `ark-bn254` plays for the
reference (/root/reference/distributed-prover/Cargo.toml:12-19).
"""
from __future__ import annotations

from ..fields.bn254 import B_G1, G1_GEN, G2_GEN_X, G2_GEN_Y, P, R
from ..fields.host import Fq2, fq_inv

# G2 curve coefficient b2 = 3 / (9 + u)
B_G2 = Fq2(3) * Fq2(9, 1).inv()

G2_GEN = (Fq2(*G2_GEN_X), Fq2(*G2_GEN_Y))


def _inv(x):
    return fq_inv(x) if isinstance(x, int) else x.inv()


def _is_zero(x):
    return x % P == 0 if isinstance(x, int) else x.is_zero()


def _norm(x):
    return x % P if isinstance(x, int) else x


def _eq(a, b):
    return _norm(a) == _norm(b) if isinstance(a, int) else a == b


def pt_neg(pt):
    if pt is None:
        return None
    x, y = pt
    return (x, (-y) % P if isinstance(y, int) else -y)


def pt_dbl(pt):
    if pt is None:
        return None
    x, y = pt
    if _is_zero(y):
        return None
    lam = 3 * x * x * _inv(2 * y) if isinstance(x, int) else (x.square() * 3) * (y * 2).inv()
    x3 = lam * lam - 2 * x if isinstance(x, int) else lam.square() - x - x
    y3 = lam * (x - x3) - y
    return (_norm(x3), _norm(y3))


def pt_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if _eq(x1, x2):
        if _eq(y1, y2):
            return pt_dbl(p)
        return None
    lam = (y2 - y1) * _inv(x2 - x1) if isinstance(x1, int) else (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2 if isinstance(x1, int) else lam.square() - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (_norm(x3), _norm(y3))


def pt_sub(p, q):
    return pt_add(p, pt_neg(q))


def pt_mul(pt, k: int):
    k %= R
    if k == 0 or pt is None:
        return None
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = pt_add(acc, add)
        add = pt_dbl(add)
        k >>= 1
    return acc


def msm_host(points, scalars):
    """Naive host MSM — reference result for small tests only."""
    acc = None
    for p, s in zip(points, scalars):
        acc = pt_add(acc, pt_mul(p, s))
    return acc


def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B_G1) % P == 0


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y.square() - x.square() * x - B_G2).is_zero()


def g1_gen():
    return G1_GEN


def g2_gen():
    return G2_GEN


# ---------------------------------------------------------------------------
# Canonical serialization (framework-internal, arkworks-inspired layout:
# little-endian coordinates, flag bits in the top byte; used for Fiat–Shamir
# hashing and on-disk artifacts).
# ---------------------------------------------------------------------------

INF_FLAG = 1 << 6


def fr_to_bytes(x: int) -> bytes:
    return (x % R).to_bytes(32, "little")


def fr_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little") % R


def g1_to_bytes(pt) -> bytes:
    if pt is None:
        out = bytearray(64)
        out[63] |= INF_FLAG
        return bytes(out)
    x, y = pt
    return (x % P).to_bytes(32, "little") + (y % P).to_bytes(32, "little")


def g1_from_bytes(b: bytes):
    if b[63] & INF_FLAG:
        return None
    return (int.from_bytes(b[:32], "little"), int.from_bytes(b[32:], "little") & ((1 << 254) - 1))


def g2_to_bytes(pt) -> bytes:
    if pt is None:
        out = bytearray(128)
        out[127] |= INF_FLAG
        return bytes(out)
    x, y = pt
    return b"".join(c.to_bytes(32, "little") for c in (x.c0, x.c1, y.c0, y.c1))


def g2_from_bytes(b: bytes):
    if b[127] & INF_FLAG:
        return None
    c = [int.from_bytes(b[32 * i : 32 * (i + 1)], "little") for i in range(4)]
    c[3] &= (1 << 254) - 1
    return (Fq2(c[0], c[1]), Fq2(c[2], c[3]))
