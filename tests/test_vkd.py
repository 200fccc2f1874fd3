"""VKD workload tests (mirrors test_vkd_rand at vkd/vkd.rs:626-639, the trace
equivalence test at vkd_constraints.rs:357-436, and the fake-commitment
subcircuit satisfiability pattern of subcircuit_circuit.rs:310-401)."""
import pytest

from hekaton_tpu.protocol.portal_manager import SetupVarPortalManager
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.utils.rng import Rng
from hekaton_tpu.workloads.vkd import (
    VerifiableKeyDirectoryCircuit,
    VerifiableKeyDirectoryCircuitParams,
)
from hekaton_tpu.workloads.vkd.vkd import null_leaf_value


@pytest.fixture(scope="module")
def vkd_circ():
    params = VerifiableKeyDirectoryCircuitParams(
        log_num_subcircuits=5, null_leaf=null_leaf_value()
    )
    return VerifiableKeyDirectoryCircuit.random(params)


def test_vkd_verify(vkd_circ):
    assert vkd_circ.verify(vkd_circ.params.null_leaf)
    assert vkd_circ.num_subcircuits() == 32
    assert len(vkd_circ.subcircuits) == 32
    # tampered final root must fail
    import copy

    bad = copy.copy(vkd_circ)
    bad.final_root = (vkd_circ.final_root + 1) % (1 << 253)
    assert not bad.verify(vkd_circ.params.null_leaf)


def test_vkd_unique_subcircuit_types(vkd_circ):
    # representative mapping must cover every subcircuit (vkd_constraints.rs:199-214)
    uniq = vkd_circ.get_unique_subcircuits()
    for i in range(vkd_circ.num_subcircuits()):
        rep = vkd_circ.representative_subcircuit(i)
        assert rep in uniq
        assert vkd_circ.subcircuits[rep].get_type() == vkd_circ.subcircuits[i].get_type()


def test_vkd_trace_equivalence_and_satisfiability(vkd_circ):
    """Native get_portal_subtraces == trace from real constraint synthesis,
    and the constraints are satisfied."""
    fast = vkd_circ.get_portal_subtraces()
    pm = SetupVarPortalManager(ConstraintSystem(), "rom")
    for idx in range(vkd_circ.num_subcircuits()):
        pm.start_subtrace()
        vkd_circ.generate_constraints(pm.cs, idx, pm)
    assert pm.cs.is_satisfied(), f"unsatisfied: {pm.cs.which_unsatisfied()}"
    assert pm.subtraces == fast


def test_vkd_subcircuits_satisfied_with_fake_commitments(vkd_circ):
    """Both prover stages against a real coordinator state but random
    commitments (no CRS / proving)."""
    import hekaton_tpu.curves.host as ch
    from hekaton_tpu.protocol.coordinator import CoordinatorStage0State
    from hekaton_tpu.protocol.ipp import ipp_setup
    from hekaton_tpu.protocol.subcircuit import SubcircuitWithPortalsProver
    from hekaton_tpu.protocol.worker import Stage0Response

    n = vkd_circ.num_subcircuits()
    ipp_ck = ipp_setup(n, Rng.from_int(8))
    stage0 = CoordinatorStage0State(vkd_circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]
    fake = [Stage0Response(i, ch.pt_mul(ch.g1_gen(), 99 + i), bytes(32)) for i in range(n)]
    stage1 = stage0.process_stage0_responses(ipp_ck, fake)
    reqs1 = [stage1.gen_request(i) for i in range(n)]

    for r0, r1 in zip(reqs0, reqs1):
        sub = SubcircuitWithPortalsProver(VerifiableKeyDirectoryCircuit, n)
        sub.subcircuit_idx = r0.subcircuit_idx
        partial = VerifiableKeyDirectoryCircuit.new(vkd_circ.params)
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
