"""Host field tower, curve, and pairing correctness (pure CPU, no JAX)."""
import random

from hekaton_tpu.fields.bn254 import P, R, FR_TWO_ADIC_ROOT, TWO_ADICITY
from hekaton_tpu.fields.host import Fq2, Fq6, Fq12, fr_batch_inv, fr_inv
from hekaton_tpu.curves.host import (
    B_G2,
    G2_GEN,
    g1_from_bytes,
    g1_gen,
    g1_is_on_curve,
    g1_to_bytes,
    g2_from_bytes,
    g2_gen,
    g2_is_on_curve,
    g2_to_bytes,
    pt_add,
    pt_dbl,
    pt_mul,
    pt_neg,
)
from hekaton_tpu.pairing.host import pairing, multi_pairing, GT_ONE

rng = random.Random(0)


def rand_fq2():
    return Fq2(rng.randrange(P), rng.randrange(P))


def rand_fq6():
    return Fq6(rand_fq2(), rand_fq2(), rand_fq2())


def rand_fq12():
    return Fq12(rand_fq6(), rand_fq6())


def test_fq2_inverse():
    for _ in range(10):
        a = rand_fq2()
        assert a * a.inv() == Fq2.one()


def test_fq6_inverse_and_v():
    for _ in range(5):
        a = rand_fq6()
        assert a * a.inv() == Fq6.one()
    v = Fq6(Fq2.zero(), Fq2.one(), Fq2.zero())
    a = rand_fq6()
    assert a * v == a.mul_by_v()


def test_fq12_inverse_and_frobenius():
    for _ in range(5):
        a = rand_fq12()
        assert a * a.inv() == Fq12.one()
    a = rand_fq12()
    assert a.pow(P) == a.frobenius()
    f6 = a
    for _ in range(6):
        f6 = f6.frobenius()
    assert f6 == a.conj()


def test_fr_roots_and_batch_inv():
    w = FR_TWO_ADIC_ROOT
    assert pow(w, 1 << TWO_ADICITY, R) == 1
    assert pow(w, 1 << (TWO_ADICITY - 1), R) == R - 1
    xs = [rng.randrange(1, R) for _ in range(20)]
    assert fr_batch_inv(xs) == [fr_inv(x) for x in xs]


def test_curve_group_laws():
    g = g1_gen()
    assert g1_is_on_curve(g)
    assert g1_is_on_curve(pt_dbl(g))
    assert pt_add(g, pt_dbl(g)) == pt_mul(g, 3)
    assert pt_add(g, pt_neg(g)) is None
    assert pt_mul(g, R) is None  # group order
    a, b = rng.randrange(R), rng.randrange(R)
    assert pt_add(pt_mul(g, a), pt_mul(g, b)) == pt_mul(g, (a + b) % R)

    h = g2_gen()
    assert g2_is_on_curve(h)
    assert g2_is_on_curve(pt_mul(h, 12345))
    assert pt_mul(h, R) is None


def test_serialization_roundtrip():
    g = pt_mul(g1_gen(), 987654321)
    assert g1_from_bytes(g1_to_bytes(g)) == g
    assert g1_from_bytes(g1_to_bytes(None)) is None
    h = pt_mul(g2_gen(), 12345)
    assert g2_from_bytes(g2_to_bytes(h)) == h
    assert g2_from_bytes(g2_to_bytes(None)) is None


def test_pairing_bilinearity():
    g, h = g1_gen(), g2_gen()
    e = pairing(g, h)
    assert e != GT_ONE
    assert e.pow(R) == GT_ONE
    a, b = 12345, 67891
    assert pairing(pt_mul(g, a), pt_mul(h, b)) == e.pow(a * b % R)
    assert pairing(pt_neg(g), h) == e.inv()


def test_multi_pairing_product():
    g, h = g1_gen(), g2_gen()
    # e(2G, H) * e(G, 3H) == e(G, H)^5
    lhs = multi_pairing([pt_mul(g, 2), g], [h, pt_mul(h, 3)])
    assert lhs == pairing(g, h).pow(5)
    # verifier-style check: e(aG, bH) * e(-abG, H) == 1
    a, b = 777, 999
    assert multi_pairing([pt_mul(g, a), pt_neg(pt_mul(g, a * b))], [pt_mul(h, b), h]) == GT_ONE


def test_compressed_point_serialization():
    """arkworks-style compressed points: x + sign/infinity flag bits."""
    import random

    import hekaton_tpu.curves.host as ch
    from hekaton_tpu.fields.bn254 import R

    rng = random.Random(4)
    for _ in range(5):
        p = ch.pt_mul(ch.g1_gen(), rng.randrange(1, R))
        b = ch.g1_to_bytes_compressed(p)
        assert len(b) == 32 and ch.g1_from_bytes_compressed(b) == p
        q = ch.pt_mul(ch.g2_gen(), rng.randrange(1, R))
        b2 = ch.g2_to_bytes_compressed(q)
        assert len(b2) == 64 and ch.g2_from_bytes_compressed(b2) == q
    assert ch.g1_from_bytes_compressed(ch.g1_to_bytes_compressed(None)) is None
    assert ch.g2_from_bytes_compressed(ch.g2_to_bytes_compressed(None)) is None
    # negated point flips only the flag bit
    p = ch.pt_mul(ch.g1_gen(), 7)
    pn = ch.pt_neg(p)
    assert ch.g1_to_bytes_compressed(p)[:31] == ch.g1_to_bytes_compressed(pn)[:31]
    assert ch.g1_from_bytes_compressed(ch.g1_to_bytes_compressed(pn)) == pn
