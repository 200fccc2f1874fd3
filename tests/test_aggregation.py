"""TIPA + SnarkPack aggregation tests (mirror of aggregation.rs:138-345 plus a
full outer verifier, which the reference leaves unimplemented)."""
import random

import hekaton_tpu.curves.host as ch
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.pairing.host import multi_pairing
from hekaton_tpu.protocol.ipp import commit_pair
from hekaton_tpu.protocol.tipa import (
    GipaInstance,
    GipaWitness,
    tipa_prove,
    tipa_setup,
    tipa_verify,
)
from hekaton_tpu.utils.rng import Rng

rng_py = random.Random(1234)


def _rand_instance(n, twist):
    left = [ch.pt_mul(ch.g1_gen(), rng_py.randrange(1, R)) for _ in range(n)]
    right = [ch.pt_mul(ch.g2_gen(), rng_py.randrange(1, R)) for _ in range(n)]
    tp = [pow(twist, i, R) for i in range(n)]
    z = multi_pairing([ch.pt_mul(l, t) for l, t in zip(left, tp)], right)
    return left, right, z


def test_tipa_roundtrip():
    n = 4
    pk = tipa_setup(n, Rng.from_int(77))
    twist = rng_py.randrange(1, R)
    left, right, z = _rand_instance(n, twist)
    com = commit_pair(pk.ck, left, right)
    instance = GipaInstance(size=n, output=z, commitment=com, twist=twist)
    proof = tipa_prove(pk, instance, GipaWitness(left, right))
    assert tipa_verify(pk.vk(), instance, proof)

    # Tampered output must fail
    bad = GipaInstance(size=n, output=z * z, commitment=com, twist=twist)
    assert not tipa_verify(pk.vk(), bad, proof)


def test_tipa_size_one():
    n = 1
    pk = tipa_setup(n, Rng.from_int(78))
    twist = rng_py.randrange(1, R)
    left, right, z = _rand_instance(n, twist)
    com = commit_pair(pk.ck, left, right)
    instance = GipaInstance(size=n, output=z, commitment=com, twist=twist)
    proof = tipa_prove(pk, instance, GipaWitness(left, right))
    assert tipa_verify(pk.vk(), instance, proof)
