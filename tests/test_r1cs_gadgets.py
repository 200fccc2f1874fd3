"""R1CS builder, gadget layer, Poseidon, SHA-256 gadget correctness."""
import hashlib
import random
import struct

from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.hashes import poseidon as pos
from hekaton_tpu.hashes import sha256_gadget as shag
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.r1cs.gadgets import Boolean, FpVar

rng = random.Random(42)


def test_fpvar_arithmetic_and_constraints():
    cs = ConstraintSystem()
    a = FpVar.witness(cs, 7)
    b = FpVar.witness(cs, 9)
    c = a * b
    assert c.value == 63
    (a + b).enforce_equal(16)
    (a - b + 2).enforce_equal(0)
    d = a.scale(3) + b  # 30
    (d * d).enforce_equal(900)
    assert cs.is_satisfied()
    # tamper: witness a wrong product
    cs2 = ConstraintSystem()
    x = FpVar.witness(cs2, 3)
    y = FpVar.witness(cs2, 4)
    _ = x * y
    cs2.witness_assignment[-1] = 13  # corrupt the product witness
    assert not cs2.is_satisfied()


def test_boolean_ops_and_select():
    cs = ConstraintSystem()
    for av in (0, 1):
        for bv in (0, 1):
            a, b = Boolean.witness(cs, av), Boolean.witness(cs, bv)
            assert (a & b).value == (av & bv)
            assert (a | b).value == (av | bv)
            assert (a ^ b).value == (av ^ bv)
            assert a.not_().value == 1 - av
    t, f = FpVar.witness(cs, 111), FpVar.witness(cs, 222)
    assert Boolean.witness(cs, 1).select(t, f).value == 111
    assert Boolean.witness(cs, 0).select(t, f).value == 222
    x = FpVar.witness(cs, 0)
    assert x.is_zero().value == 1
    y = FpVar.witness(cs, 5)
    assert y.is_zero().value == 0
    assert y.is_eq(FpVar.witness(cs, 5)).value == 1
    assert cs.is_satisfied()


def test_bit_decomposition():
    cs = ConstraintSystem()
    v = FpVar.witness(cs, 0b101101)
    bits = v.to_bits_le(8)
    assert [b.value for b in bits] == [1, 0, 1, 1, 0, 1, 0, 0]
    assert cs.is_satisfied()


def test_poseidon_native_vs_gadget():
    inputs = [rng.randrange(R) for _ in range(4)]
    expect_leaf = pos.hash_leaf(inputs)
    expect_2to1 = pos.hash_two_to_one(inputs[0], inputs[1])

    cs = ConstraintSystem()
    in_vars = [FpVar.witness(cs, v) for v in inputs]
    out = pos.hash_leaf_var(in_vars)
    assert out.value == expect_leaf
    out2 = pos.hash_two_to_one_var(in_vars[0], in_vars[1])
    assert out2.value == expect_2to1
    assert cs.is_satisfied()
    # determinism of param generation
    assert pos.leaf_config().ark[0][0] == pos.PoseidonConfig(3, 5, 8, 56).ark[0][0]


def test_sha256_native_compress_matches_hashlib():
    # one full padded block of the message "abc"
    msg = b"abc"
    block = msg + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8)
    block = block[:56] + struct.pack(">Q", len(msg) * 8)
    words = shag.bytes_to_words_be(block)
    state = shag.sha256_compress_native(list(shag.SHA256_H0), words)
    assert shag.words_to_bytes_be(state) == hashlib.sha256(msg).digest()


def test_sha256_gadget_matches_native():
    cs = ConstraintSystem()
    block_vals = [rng.randrange(1 << 32) for _ in range(16)]
    state = shag.initial_state_var(cs)
    block = [shag.UInt32.witness(cs, v) for v in block_vals]
    out = shag.sha256_compress_var(cs, state, block)
    expect = shag.sha256_compress_native(list(shag.SHA256_H0), block_vals)
    assert [w.value for w in out] == expect
    assert cs.is_satisfied()
    print("sha256 compression constraints:", cs.num_constraints)
