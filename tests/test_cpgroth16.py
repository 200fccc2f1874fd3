"""CP-Groth16 end-to-end: setup -> commit -> prove -> verify.

Mirrors the reference's own test strategy (a small multi-stage circuit with a
committed stage — cp-groth16/src/lib.rs tests and benches/bench.rs
PolyEvalCircuit): stage 0 commits polynomial coefficients, stage 1 proves a
public evaluation.
"""
import random

from hekaton_tpu.cpgroth16.backend import HostBackend
from hekaton_tpu.cpgroth16.generator import generate_parameters
from hekaton_tpu.cpgroth16.prover import CommitmentBuilder
from hekaton_tpu.cpgroth16.verifier import prepare_verifying_key, verify_proof
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.r1cs.builder import ConstraintSystem, MultiStageSynthesizer
from hekaton_tpu.r1cs.gadgets import FpVar

rng_py = random.Random(5)


class PolyEvalCircuit(MultiStageSynthesizer):
    """Stage 0: commit to coefficients. Stage 1: prove y = poly(x) publicly."""

    def __init__(self, coeffs, x, extra_constraints: int = 0):
        self.coeffs = coeffs
        self.x = x
        self.y = 0
        for c in reversed(coeffs):
            self.y = (self.y * x + c) % R
        self.extra = extra_constraints
        self.coeff_vars = None

    def total_num_stages(self):
        return 2

    def generate_constraints(self, stage, cs: ConstraintSystem):
        cs.begin_stage()
        if stage == 0:
            self.coeff_vars = [FpVar.witness(cs, c) for c in self.coeffs]
        else:
            x = FpVar.input(cs, self.x)
            y = FpVar.input(cs, self.y)
            acc = FpVar.constant(cs, 0)
            for c in reversed(self.coeff_vars):
                acc = acc * x + c
            acc.enforce_equal(y)
            for i in range(self.extra):
                v = FpVar.witness(cs, i + 3)
                (v * v).enforce_equal((i + 3) * (i + 3) % R)
        cs.end_stage()


def _run(backend, coeffs=None, x=None):
    from hekaton_tpu.utils.rng import Rng

    coeffs = coeffs or [rng_py.randrange(R) for _ in range(4)]
    x = x or rng_py.randrange(R)
    circuit = PolyEvalCircuit(coeffs, x, extra_constraints=3)

    pk = generate_parameters(PolyEvalCircuit(coeffs, x, 3), Rng.from_int(1), backend)
    cb = CommitmentBuilder(circuit, pk, backend)
    com, kappa = cb.commit(Rng.from_int(2))
    proof = cb.prove([com], [kappa], Rng.from_int(3))

    pvk = prepare_verifying_key(pk.vk)
    assert verify_proof(pvk, proof, [x, circuit.y]), "valid proof rejected"
    assert not verify_proof(pvk, proof, [x, (circuit.y + 1) % R]), "invalid inputs accepted"
    # tampered proof must fail
    import hekaton_tpu.curves.host as ch

    bad = proof
    bad.a = ch.pt_add(bad.a, ch.g1_gen())
    assert not verify_proof(pvk, bad, [x, circuit.y])
    return pk, proof


def test_cpgroth16_host_backend():
    _run(HostBackend())


def test_cpgroth16_deterministic_commit():
    """Same seed -> same commitment (worker statelessness invariant,
    reference worker.rs:234-241)."""
    from hekaton_tpu.utils.rng import Rng

    coeffs = [5, 6, 7]
    circ1 = PolyEvalCircuit(coeffs, 11)
    circ2 = PolyEvalCircuit(coeffs, 11)
    pk = generate_parameters(PolyEvalCircuit(coeffs, 11), Rng.from_int(9), HostBackend())
    cb1 = CommitmentBuilder(circ1, pk, HostBackend())
    cb2 = CommitmentBuilder(circ2, pk, HostBackend())
    com1, k1 = cb1.commit(Rng.from_int(77))
    com2, k2 = cb2.commit(Rng.from_int(77))
    assert com1 == com2 and k1 == k2


def test_cpgroth16_tpu_backend():
    """The full CP-Groth16 pipeline (setup -> commit -> prove -> verify, plus
    the negative checks inside _run) through TpuBackend's jitted kernels —
    on whatever XLA backend the suite runs on (the virtual-CPU mesh in CI;
    the same code path serves the real chip). Round-1 shipped this backend
    untested end-to-end."""
    from hekaton_tpu.cpgroth16.backend import TpuBackend

    coeffs, x = [5, 17, 923479, 2], 31337
    pk, proof = _run(TpuBackend(), coeffs, x)
    # cross-backend agreement: the host backend must produce the SAME proof
    # for the same circuit and randomness (the backends differ only in where
    # the algebra runs, not in what it computes)
    pk_h, proof_h = _run(HostBackend(), coeffs, x)
    assert proof == proof_h
