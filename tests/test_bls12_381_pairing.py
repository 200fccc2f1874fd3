"""BLS12-381 G2 + ate pairing (pairing/bls12_381.py) self-validation:
generator/curve constants, subgroup order, and bilinearity — the same
property battery the BN254 tower passes (tests/test_host_algebra.py)."""
import random

from hekaton_tpu.fields.bls12_381 import P, R
from hekaton_tpu.fields.bls12_381_tower import Fq2, Fq12
from hekaton_tpu.pairing import bls12_381 as bls

rng = random.Random(17)


def test_g2_generator_on_curve_and_order():
    q = bls.g2_gen()
    assert bls.g2_is_on_curve(q)
    assert bls.g2_mul(q, R) is None  # prime-order subgroup
    assert bls.g2_add(q, bls.g2_neg(q)) is None


def test_g2_group_law():
    q = bls.g2_gen()
    q2 = bls.g2_add(q, q)
    q3 = bls.g2_add(q2, q)
    assert bls.g2_is_on_curve(q2) and bls.g2_is_on_curve(q3)
    assert bls.g2_mul(q, 3) == q3
    assert bls.g2_add(q3, bls.g2_neg(q2)) == q


def _g1_mul(pt, k):
    # minimal affine ladder over ints mod P (G1: y^2 = x^3 + 4)
    k %= R
    acc = None

    def add(p, q):
        if p is None:
            return q
        if q is None:
            return p
        if p[0] == q[0]:
            if (p[1] + q[1]) % P == 0:
                return None
            lam = 3 * p[0] * p[0] * pow(2 * p[1], P - 2, P) % P
        else:
            lam = (q[1] - p[1]) * pow(q[0] - p[0], P - 2, P) % P
        x = (lam * lam - p[0] - q[0]) % P
        return (x, (lam * (p[0] - x) - p[1]) % P)

    while k:
        if k & 1:
            acc = add(acc, pt)
        pt = add(pt, pt)
        k >>= 1
    return acc


def test_pairing_bilinear_nondegenerate():
    from hekaton_tpu.fields.bls12_381 import G1_GEN

    a = rng.randrange(1, 1 << 64)
    b = rng.randrange(1, 1 << 64)
    p, q = G1_GEN, bls.g2_gen()
    e = bls.pairing(p, q)
    assert e != Fq12.one(), "degenerate pairing"
    assert e.pow(R) == Fq12.one(), "pairing value outside mu_r"
    lhs = bls.pairing(_g1_mul(p, a), bls.g2_mul(q, b))
    assert lhs == e.pow(a * b % R), "bilinearity"
