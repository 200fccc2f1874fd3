"""Protocol core tests, mirroring the reference's test layers (SURVEY.md §4):
gadget equivalence, portal-manager protocol, trace equivalence,
fake-commitment subcircuit satisfiability, and full e2e with real proofs.
"""
import random

import pytest

from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.protocol import transcript as tr
from hekaton_tpu.protocol.coordinator import (
    CoordinatorStage0State,
    G16ProvingKeyGenerator,
    generate_exec_tree,
    sort_subtraces_by_addr,
)
from hekaton_tpu.protocol.eval_tree import ExecTreeLeaf, MerkleTree, verify_path_host
from hekaton_tpu.protocol.ipp import ipp_setup, commit_only_left
from hekaton_tpu.protocol.portal_manager import RomProverPortalManager, SetupRomPortalManager
from hekaton_tpu.protocol.subcircuit import SubcircuitWithPortalsProver
from hekaton_tpu.protocol.worker import (
    Stage0Response,
    process_stage0_request,
    process_stage1_request,
)
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.r1cs.gadgets import FpVar
from hekaton_tpu.utils.rng import Rng
from hekaton_tpu.workloads.chain import PortalChainCircuit, PortalChainParams
from hekaton_tpu.workloads.merkle import MerkleTreeCircuit, MerkleTreeCircuitParams

rng_py = random.Random(99)


def test_running_eval_native_vs_var():
    cs = ConstraintSystem()
    evals = tr.RomRunningEvaluation(
        rng_py.randrange(R), rng_py.randrange(R), (rng_py.randrange(R), rng_py.randrange(R))
    )
    evals_var = tr.RomRunningEvaluationVar(
        FpVar.witness(cs, evals.time_ordered_eval), FpVar.witness(cs, evals.addr_ordered_eval)
    )
    evals_var.set_challenges([FpVar.witness(cs, c) for c in evals.challenges])
    e = tr.RomTranscriptEntry(addr=rng_py.randrange(1 << 64), val=rng_py.randrange(R))
    ev = tr.RomTranscriptEntryVar.witness(cs, e)
    evals.update_time_ordered(e)
    evals_var.update_time_ordered(ev)
    e2 = tr.RomTranscriptEntry(addr=5, val=7)
    ev2 = tr.RomTranscriptEntryVar.witness(cs, e2)
    evals.update_addr_ordered(e2)
    evals_var.update_addr_ordered(ev2)
    assert evals_var.time_ordered_eval.value == evals.time_ordered_eval
    assert evals_var.addr_ordered_eval.value == evals.addr_ordered_eval
    assert cs.is_satisfied()


def test_rom_portal_manager_protocol():
    """Mirror of rom_portal_manager.rs:240-298: set/get chain, permutation check."""
    pm = SetupRomPortalManager()
    pm.start_subtrace()
    for i in range(10):
        if i != 0:
            pm.get(str(i - 1))
        pm.set(str(i), i * i + 1)

    time_trace = pm.subtraces[0]
    addr_trace = sorted(time_trace, key=lambda e: e.addr)
    addr_trace = [tr.RomTranscriptEntry.padding()] + addr_trace

    cs = ConstraintSystem()
    tvars = [tr.RomTranscriptEntryVar.witness(cs, e) for e in time_trace]
    avars = [tr.RomTranscriptEntryVar.witness(cs, e) for e in addr_trace]
    one = FpVar.witness(cs, 1)
    evals = tr.RomRunningEvaluationVar(one, one, (FpVar.witness(cs, 3), FpVar.witness(cs, 17)))
    prover = RomProverPortalManager(tvars, avars, evals)
    for i in range(10):
        if i != 0:
            prover.get(str(i - 1))
        prover.set(str(i), FpVar.witness(cs, i * i + 1))
    prover.running_evals.time_ordered_eval.enforce_equal(prover.running_evals.addr_ordered_eval)
    assert cs.is_satisfied()


def test_merkle_tree_and_paths():
    leaves = [[rng_py.randrange(R)] for _ in range(8)]
    t = MerkleTree(leaves)
    for i in (0, 3, 7):
        path = t.generate_proof(i)
        assert verify_path_host(t.root(), path, leaves[i])
        assert not verify_path_host(t.root(), path, [leaves[i][0] + 1])


def test_merkle_workload_trace_equivalence():
    """Fast native get_portal_subtraces == trace from real constraint synthesis
    (mirror of tree_hash_circuit.rs:736-765)."""
    from hekaton_tpu.protocol.portal_manager import SetupVarPortalManager

    params = MerkleTreeCircuitParams(2, 1, 3)
    circ = MerkleTreeCircuit.rand(Rng.from_int(4), params)
    fast = circ.get_portal_subtraces()

    slow_pm = SetupVarPortalManager(ConstraintSystem(), "rom")
    for idx in range(circ.num_subcircuits()):
        slow_pm.start_subtrace()
        circ.generate_constraints(ConstraintSystem(), idx, slow_pm)
    assert slow_pm.subtraces == fast


def test_subcircuit_satisfied_with_fake_commitments():
    """Mirror of subcircuit_circuit.rs:310-401: run both prover stages against
    a real coordinator state but random commitments; constraints must hold."""
    params = MerkleTreeCircuitParams(2, 1, 4)
    circ = MerkleTreeCircuit.rand(Rng.from_int(7), params)
    n = circ.num_subcircuits()
    ipp_ck = ipp_setup(n, Rng.from_int(8))

    stage0 = CoordinatorStage0State(circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]
    import hekaton_tpu.curves.host as ch

    fake_resps = [
        Stage0Response(i, ch.pt_mul(ch.g1_gen(), 1234 + i), bytes(32)) for i in range(n)
    ]
    stage1 = stage0.process_stage0_responses(ipp_ck, fake_resps)
    reqs1 = [stage1.gen_request(i) for i in range(n)]

    for r0, r1 in zip(reqs0, reqs1):
        sub = SubcircuitWithPortalsProver(MerkleTreeCircuit, n)
        sub.subcircuit_idx = r0.subcircuit_idx
        partial = MerkleTreeCircuit.new(params)
        partial.set_serialized_witnesses(r1.subcircuit_idx, r1.serialized_witnesses)
        sub.circ = partial
        sub.time_ordered_subtrace = r0.time_ordered_subtrace
        sub.addr_ordered_subtrace = r0.addr_ordered_subtrace
        sub.cur_leaf = r1.cur_leaf
        sub.next_leaf_membership = r1.next_leaf_membership
        sub.challenges = r1.cur_leaf.evals.challenge_list()
        sub.root = r1.root

        cs = ConstraintSystem()
        sub.generate_constraints(0, cs)
        sub.generate_constraints(1, cs)
        assert cs.is_satisfied(), f"subcircuit {r0.subcircuit_idx}: {cs.which_unsatisfied()}"


def run_e2e_prover(circuit_cls, params, backend, verify_each=True):
    """Mirror of subcircuit_circuit.rs:441-572 run_e2e_prover, plus per-proof
    Groth16 verification (which the reference leaves commented out)."""
    from hekaton_tpu.cpgroth16.verifier import prepare_verifying_key, verify_proof

    rng = Rng.from_int(1000)
    circ = circuit_cls.rand(rng, params)
    n = circ.num_subcircuits()

    from hekaton_tpu.protocol.coordinator import crs_plan

    gen = G16ProvingKeyGenerator(circ, backend)
    unique, reps = crs_plan(circ)
    minimal_pks = {i: gen.gen_pk(Rng.from_int(50 + i), i) for i in unique}
    pks = [minimal_pks[reps[i]] for i in range(n)]

    stage0 = CoordinatorStage0State(circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]
    resps0 = [
        process_stage0_request(rng.fork(str(i).encode()), circuit_cls, pks[i], reqs0[i], backend)
        for i in range(n)
    ]

    ipp_ck = ipp_setup(n, Rng.from_int(2000))
    stage1 = stage0.process_stage0_responses(ipp_ck, resps0)
    reqs1 = [stage1.gen_request(i) for i in range(n)]
    agg_state = stage1.into_agg_state()

    resps1 = [
        process_stage1_request(
            rng.fork(b"s1" + str(i).encode()),
            circuit_cls,
            pks[i],
            reqs0[i],
            resps0[i],
            reqs1[i],
            backend,
        )
        for i in range(n)
    ]

    if verify_each:
        for i, resp in enumerate(resps1):
            pvk = prepare_verifying_key(pks[i].vk)
            assert verify_proof(pvk, resp.proof, agg_state.public_inputs), f"proof {i} invalid"
    return circ, pks, ipp_ck, agg_state, resps0, resps1


def test_e2e_portal_chain():
    """Full coordinator/worker pipeline on the chain workload, every Groth16
    proof verified against [challenges, root], plus SnarkPack aggregation of
    the subcircuit proofs and full aggregate verification (the reference only
    TIPA-verifies inline, aggregation.rs:339-341).

    Uses the host backend: the TPU kernels are covered by their own tests and
    by bench.py on real hardware; XLA:CPU compile latency would dominate here.
    """
    from hekaton_tpu.cpgroth16.backend import HostBackend
    from hekaton_tpu.protocol.aggregation import AggProvingKey, agg_transcript
    from hekaton_tpu.protocol.tipa import tipa_setup

    circ, pks, ipp_ck, agg_state, resps0, resps1 = run_e2e_prover(
        PortalChainCircuit, PortalChainParams(4), HostBackend()
    )

    # Aggregate all subcircuit proofs into one (mirror of gen_agg_proof,
    # distributed-prover/coordinator.rs:392-417). The TIPA key must use the
    # same IPP ck that produced the super-commitment.
    from hekaton_tpu.protocol.tipa import tipa_key_from_ipp

    agg_pk = AggProvingKey(tipa_key_from_ipp(ipp_ck), lambda i: pks[i])
    agg_proof = agg_state.gen_agg_proof(agg_pk, resps1)
    assert agg_pk.verify_aggregate(
        agg_transcript(), agg_state.super_com, agg_proof, agg_state.public_inputs
    )


def test_tampered_trace_rejected():
    """The permutation/memory-checking argument must reject a tampered portal
    value: corrupt one time-ordered entry and the final time-eval == addr-eval
    closure (or the addr-coherence checks) must fail."""
    params = PortalChainParams(2)
    circ = PortalChainCircuit.rand(Rng.from_int(7), params)
    n = circ.num_subcircuits()
    ipp_ck = ipp_setup(n, Rng.from_int(8))
    stage0 = CoordinatorStage0State(circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]
    import hekaton_tpu.curves.host as ch

    fake = [Stage0Response(i, ch.pt_mul(ch.g1_gen(), 5 + i), bytes(32)) for i in range(n)]
    stage1 = stage0.process_stage0_responses(ipp_ck, fake)
    reqs1 = [stage1.gen_request(i) for i in range(n)]

    def run(tamper: bool) -> bool:
        # a tampered witness either fails cs.is_satisfied() or trips the
        # enforce_equal witness-bug guard during synthesis — both = rejected
        ok = True
        for r0, r1 in zip(reqs0, reqs1):
            sub = SubcircuitWithPortalsProver(PortalChainCircuit, n)
            sub.subcircuit_idx = r0.subcircuit_idx
            partial = PortalChainCircuit.new(params)
            partial.set_serialized_witnesses(r1.subcircuit_idx, r1.serialized_witnesses)
            sub.circ = partial
            time_st = list(r0.time_ordered_subtrace)
            if tamper and r0.subcircuit_idx == 1:
                e = time_st[0]
                time_st[0] = tr.RomTranscriptEntry(addr=e.addr, val=(e.val + 1) % R)
            sub.time_ordered_subtrace = time_st
            sub.addr_ordered_subtrace = r0.addr_ordered_subtrace
            sub.cur_leaf = r1.cur_leaf
            sub.next_leaf_membership = r1.next_leaf_membership
            sub.challenges = r1.cur_leaf.evals.challenge_list()
            sub.root = r1.root
            cs = ConstraintSystem()
            try:
                sub.generate_constraints(0, cs)
                sub.generate_constraints(1, cs)
            except AssertionError:
                return False
            ok = ok and cs.is_satisfied()
        return ok

    assert run(tamper=False)
    assert not run(tamper=True)
