"""Native C++ host algebra vs pure-Python ground truth.

The native library (native/hekaton_native.cpp) overrides pt_mul/pt_add/
msm_host/pairing/multi_pairing at import; these tests compare it against the
original Python implementations on random inputs (the role arkworks test
vectors play for the reference's asm feature).
"""
import random

import pytest

import hekaton_tpu.curves.host as ch
import hekaton_tpu.pairing.host as ph
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.native import available

if not available():
    pytest.skip("native library unavailable", allow_module_level=True)

from hekaton_tpu.native import accel

rng = random.Random(2024)


def _pure_pt_mul(pt, k):
    # bypass the installed override: use the Jacobian ladder directly
    if pt is None or k % R == 0:
        return None
    return ch._jac_to_affine(ch._jac_mul(pt, k % R))


def test_g1_ops_match_python():
    for _ in range(8):
        k1, k2 = rng.randrange(1, R), rng.randrange(1, R)
        p = _pure_pt_mul(ch.g1_gen(), k1)
        q = _pure_pt_mul(ch.g1_gen(), k2)
        assert accel.pt_mul(ch.g1_gen(), k1) == p
        got = accel.pt_add(p, q)
        exp = _pure_pt_mul(ch.g1_gen(), (k1 + k2) % R)
        assert got == exp
    # identities
    assert accel.pt_mul(ch.g1_gen(), 0) is None
    assert accel.pt_add(None, p) == p
    assert accel.pt_add(p, None) == p
    # p + (-p) = O
    assert accel.pt_add(p, (p[0], (-p[1]) % ch.P)) is None


def test_g2_ops_match_python():
    for _ in range(4):
        k = rng.randrange(1, R)
        p = _pure_pt_mul(ch.g2_gen(), k)
        assert accel.pt_mul(ch.g2_gen(), k) == p
        assert accel.pt_add(p, p) == _pure_pt_mul(ch.g2_gen(), 2 * k % R)


def test_msm_matches_naive():
    n = 40
    pts = [_pure_pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    acc = None
    for p, k in zip(pts, ks):
        acc = ch.pt_add(acc, accel.pt_mul(p, k))
    assert accel.msm_host(pts, ks) == acc
    # with zeros and infinities mixed in
    pts[3] = None
    ks[5] = 0
    acc = None
    for p, k in zip(pts, ks):
        acc = ch.pt_add(acc, accel.pt_mul(p, k) if p is not None else None)
    assert accel.msm_host(pts, ks) == acc


def test_pairing_matches_python():
    p1 = _pure_pt_mul(ch.g1_gen(), 12345)
    q2 = _pure_pt_mul(ch.g2_gen(), 67890)
    native = accel.pairing(p1, q2)
    pure = ph.final_exponentiation(ph.miller_loop(p1, q2))
    assert native == pure


def test_pairing_bilinearity():
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    e_ab = accel.pairing(accel.pt_mul(ch.g1_gen(), a), accel.pt_mul(ch.g2_gen(), b))
    e_base = accel.pairing(ch.g1_gen(), ch.g2_gen())
    assert e_ab == accel.gt_pow(e_base, a * b % R)


def test_multi_pairing_matches():
    g1s = [_pure_pt_mul(ch.g1_gen(), i + 1) for i in range(5)]
    g2s = [_pure_pt_mul(ch.g2_gen(), 2 * i + 1) for i in range(5)]
    native = accel.multi_pairing(g1s, g2s)
    f = ph.Fq12.one()
    for p, q in zip(g1s, g2s):
        f = f * ph.miller_loop(p, q)
    assert native == ph.final_exponentiation(f)
    # infinity entries contribute 1
    assert accel.multi_pairing([None], [ch.g2_gen()]) == ph.GT_ONE


def test_mul_batch():
    pts = [ch.g1_gen()] * 6
    ks = [rng.randrange(R) for _ in range(6)]
    assert accel.mul_batch(pts, ks) == [accel.pt_mul(ch.g1_gen(), k) for k in ks]
