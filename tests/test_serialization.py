"""Roundtrip tests for the measured proof serialization layer
(protocol/serialization.py), both compressed and uncompressed encodings."""
import random

import pytest

import hekaton_tpu.curves.host as ch
from hekaton_tpu.cpgroth16.data_structures import Proof
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.fields.host import Fq12
from hekaton_tpu.protocol.aggregation import AggProof
from hekaton_tpu.protocol.ipp import IppCom
from hekaton_tpu.protocol.serialization import (
    deserialize_agg_proof,
    deserialize_groth16_proof,
    serialize_agg_proof,
    serialize_groth16_proof,
)
from hekaton_tpu.protocol.tipa import KzgOpening, TipaProof

rng = random.Random(7)


def _fq12():
    # a structurally valid GT-like element: generator pairing powers are
    # expensive; for roundtrip coverage any Fq12 coefficient vector works
    return Fq12.from_coeffs([rng.randrange(ch.P) for _ in range(12)])


def _g1():
    return ch.pt_mul(ch.g1_gen(), rng.randrange(1, R))


def _g2():
    return ch.pt_mul(ch.g2_gen(), rng.randrange(1, R))


def _ippcom():
    return IppCom(_fq12(), _fq12())


def _agg_proof(rounds=3):
    tp = TipaProof(
        cross_coms=[(_ippcom(), _ippcom()) for _ in range(rounds)],
        cross_zs=[(_fq12(), _fq12()) for _ in range(rounds)],
        final_a=_g1(),
        final_b=_g2(),
        v1_opening=KzgOpening(_g2(), _g2()),
        v2_opening=KzgOpening(_g2(), _g2()),
        w1_opening=KzgOpening(_g1(), _g1()),
        w2_opening=KzgOpening(_g1(), _g1()),
    )
    cross = [[_fq12() for _ in range(4)] for _ in range(4)]
    return AggProof(_ippcom(), _ippcom(), cross, tp)


def _agg_eq(a: AggProof, b: AggProof) -> bool:
    if a.com_ab != b.com_ab or a.com_c != b.com_c:
        return False
    if a.cross_terms != b.cross_terms:
        return False
    ta, tb = a.tipa_proof, b.tipa_proof
    return (
        ta.cross_coms == tb.cross_coms
        and ta.cross_zs == tb.cross_zs
        and ta.final_a == tb.final_a
        and ta.final_b == tb.final_b
        and all(
            getattr(ta, f) == getattr(tb, f)
            for f in ("v1_opening", "v2_opening", "w1_opening", "w2_opening")
        )
    )


@pytest.mark.parametrize("compressed", [False, True])
def test_agg_proof_roundtrip(compressed):
    p = _agg_proof()
    blob = serialize_agg_proof(p, compressed=compressed)
    q = deserialize_agg_proof(blob)
    assert _agg_eq(p, q)
    # compressed must actually be smaller (point encodings halve)
    if compressed:
        assert len(blob) < len(serialize_agg_proof(p, compressed=False))


@pytest.mark.parametrize("compressed", [False, True])
def test_groth16_proof_roundtrip(compressed):
    p = Proof(_g1(), _g2(), _g1(), [_g1(), _g1()])
    blob = serialize_groth16_proof(p, compressed=compressed)
    q = deserialize_groth16_proof(blob)
    assert q == p


def test_bad_header_rejected():
    p = _agg_proof(rounds=1)
    blob = bytearray(serialize_agg_proof(p))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        deserialize_agg_proof(bytes(blob))
    with pytest.raises(ValueError):
        deserialize_agg_proof(bytes(serialize_agg_proof(p)) + b"\x00")


def test_compressed_g2_inf_and_subgroup_boundary():
    # infinity points survive the compressed encodings
    p = Proof(None, None, _g1(), [])
    q = deserialize_groth16_proof(serialize_groth16_proof(p, compressed=True))
    assert q == p
