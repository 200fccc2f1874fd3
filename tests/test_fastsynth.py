"""Value-only synthesis + CompiledMatrices vs full synthesis.

Contract: identical allocation order (witness assignments bit-equal), and
the compiled matvec reproduces _matrix_evals exactly — including circuits
heavy in full-width random coefficients (Poseidon ARK/MDS) and power-of-two
coefficients (bit decompositions)."""
import random

import pytest

from hekaton_tpu.cpgroth16.prover import _matrix_evals
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.hashes.poseidon import hash_two_to_one_var
from hekaton_tpu.hashes.sha256_gadget import UInt32, initial_state_var, sha256_compress_var
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.r1cs.fastsynth import CompiledMatrices
from hekaton_tpu.r1cs.gadgets import Boolean, FpVar

rng = random.Random(41)


def _build(cs: ConstraintSystem):
    """A gadget soup covering every coefficient class and allocation path."""
    cs.begin_stage()
    x = FpVar.witness(cs, rng.randrange(R))
    y = FpVar.witness(cs, 12345)
    cs.end_stage()
    cs.begin_stage()
    z = x * y + x.scale(R - 3) - y.scale(1 << 200)  # small, negative, 2^k coeffs
    w = z * z
    b = w.is_zero()
    sel = b.select(x, w)
    inv = (y + 1).inverse()
    bits = y.to_bits_le(40)
    acc = FpVar.constant(cs, 0)
    for i, bit in enumerate(bits):
        acc = acc + bit.var.scale(1 << i)
    acc.enforce_equal(y)
    h = hash_two_to_one_var(x, sel * inv)  # Poseidon: full-width ARK/MDS coeffs
    block = [UInt32.witness(cs, rng.getrandbits(32)) for _ in range(16)]
    sha256_compress_var(cs, initial_state_var(cs), block)
    h.enforce_equal(h)
    cs.end_stage()
    return cs


def test_value_only_assignment_matches_full():
    rng.seed(7)
    full = _build(ConstraintSystem())
    rng.seed(7)
    fast = _build(ConstraintSystem(value_only=True))
    assert fast.witness_assignment == full.witness_assignment
    assert fast.instance_assignment == full.instance_assignment
    assert fast.stage_ranges == full.stage_ranges
    assert fast.num_constraints == 0 and full.num_constraints > 1000


def test_compiled_matvec_matches_matrix_evals():
    rng.seed(9)
    full = _build(ConstraintSystem())
    assert full.is_satisfied()
    m = full.num_constraints + full.num_instance
    domain = 1
    while domain < m:
        domain <<= 1
    exp = _matrix_evals(full, domain)
    cm = CompiledMatrices(full)
    got = cm.evals(full.full_assignment(), domain, check=True)
    assert got == exp


def test_compiled_check_catches_bad_witness():
    rng.seed(11)
    full = _build(ConstraintSystem())
    cm = CompiledMatrices(full)
    z = full.full_assignment()
    z[len(full.instance_assignment) + 3] = (z[len(full.instance_assignment) + 3] + 1) % R
    with pytest.raises(AssertionError, match="unsatisfied"):
        cm.evals(z, 1 << 16, check=True)
