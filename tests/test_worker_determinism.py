"""Worker statelessness / elastic recovery: stage-0 commitments and stage-1
proofs must be exactly reproducible from the request + the 32-byte com_seed
(the property the reference's recovery story relies on, worker.rs:234-241,
all_in_one.rs:175-183)."""
import pickle

from hekaton_tpu.cpgroth16.backend import HostBackend
from hekaton_tpu.protocol.coordinator import CoordinatorStage0State, G16ProvingKeyGenerator, crs_plan
from hekaton_tpu.protocol.ipp import ipp_setup
from hekaton_tpu.protocol.worker import process_stage0_request, process_stage1_request
from hekaton_tpu.utils.rng import Rng
from hekaton_tpu.workloads.chain import PortalChainCircuit, PortalChainParams


def test_worker_replay_determinism():
    backend = HostBackend()
    circ = PortalChainCircuit.rand(Rng.from_int(1), PortalChainParams(2))
    n = circ.num_subcircuits()
    gen = G16ProvingKeyGenerator(circ, backend)
    unique, reps = crs_plan(circ)
    minimal = {i: gen.gen_pk(Rng.from_int(50 + i), i) for i in unique}
    pks = [minimal[reps[i]] for i in range(n)]

    stage0 = CoordinatorStage0State(circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]
    resps0 = [
        process_stage0_request(Rng.from_int(7 + i), PortalChainCircuit, pks[i], reqs0[i], backend)
        for i in range(n)
    ]
    # replaying stage 0 with the same rng gives the identical commitment+seed
    replay0 = process_stage0_request(Rng.from_int(7), PortalChainCircuit, pks[0], reqs0[0], backend)
    assert replay0.com == resps0[0].com and replay0.com_seed == resps0[0].com_seed

    ipp_ck = ipp_setup(n, Rng.from_int(9))
    stage1 = stage0.process_stage0_responses(ipp_ck, resps0)
    reqs1 = [stage1.gen_request(i) for i in range(n)]

    # a "crashed" worker is replaced: stage 1 runs on a fresh worker from
    # pickled requests + the original seed, twice — identical proofs
    blob = pickle.dumps((reqs0[1], resps0[1], reqs1[1]))
    r0, s0, r1 = pickle.loads(blob)
    p_a = process_stage1_request(Rng.from_int(77), PortalChainCircuit, pks[1], r0, s0, r1, backend)
    p_b = process_stage1_request(Rng.from_int(77), PortalChainCircuit, pks[1], r0, s0, r1, backend)
    assert p_a.proof == p_b.proof
