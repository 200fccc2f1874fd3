"""Mesh-sharded prover integration test: the REAL work pipeline (real CRS,
real witnesses from the portal manager) batched over a virtual 8-device mesh
must produce proofs BIT-IDENTICAL to the sequential worker path, and every
proof (plus the SnarkPack aggregate) must verify.

This is the TPU-native replacement for the reference's MPI two-round
scatter/gather (mpi-snark/src/bin/node.rs:461-604) actually exercised, not
just sketched with random tensors.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hekaton_tpu.cpgroth16.backend import HostBackend
from hekaton_tpu.cpgroth16.verifier import prepare_verifying_key, verify_proof
from hekaton_tpu.protocol.coordinator import CoordinatorStage0State
from hekaton_tpu.protocol.ipp import ipp_setup
from hekaton_tpu.protocol.worker import process_stage0_request, process_stage1_request
from hekaton_tpu.runtime.keys import ProvingKeys
from hekaton_tpu.runtime.mesh_prover import MeshProver
from hekaton_tpu.runtime.spmd import make_mesh
from hekaton_tpu.utils.rng import Rng
from hekaton_tpu.workloads.chain import PortalChainCircuit, PortalChainParams


def test_mesh_prover_bit_identical_and_verifies():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # the cheap algebraic exec-tree hash keeps the subcircuits ~50 columns
    # instead of ~1100 (Poseidon membership gadgets): what this test checks
    # is the mesh RUNTIME (sharded batching + bit-parity with the sequential
    # path), and XLA:CPU compile latency scales with circuit size
    from hekaton_tpu.protocol import eval_tree as et

    prev_hash = et.set_tree_hash(et.ALGEBRAIC_TEST_HASH)
    try:
        _run_mesh_vs_sequential()
    finally:
        et.set_tree_hash(prev_hash)


def _run_mesh_vs_sequential():
    backend = HostBackend()
    rng = Rng.from_int(1000)
    circ = PortalChainCircuit.rand(rng, PortalChainParams(4))
    circuit_cls = PortalChainCircuit
    n = circ.num_subcircuits()

    keys = ProvingKeys.generate("chain", circ, backend, lambda i: Rng.from_int(50 + i))

    stage0 = CoordinatorStage0State(circ)
    reqs0 = [stage0.gen_request(i) for i in range(n)]

    # ---- sequential ground truth (the single-process worker path) ----
    seq0 = [
        process_stage0_request(
            rng.fork(str(i).encode()), circuit_cls, keys.get_pk(i), reqs0[i], backend
        )
        for i in range(n)
    ]

    # ---- mesh path on a NON-default (2 sub x 4 pts) mesh shape ----
    mesh = make_mesh(8, sub=2, pts=4)
    mp = MeshProver(
        mesh, keys, force_ladder=True,
        compiler_options={"xla_backend_optimization_level": 1, "xla_llvm_disable_expensive_passes": True},
    )
    mesh0 = mp.stage0_all(rng, circuit_cls, reqs0)

    for a, b in zip(seq0, mesh0):
        assert a.subcircuit_idx == b.subcircuit_idx
        assert a.com_seed == b.com_seed
        assert a.com == b.com, f"stage-0 commitment mismatch @ {a.subcircuit_idx}"

    # ---- coordinator: super-commitment + exec tree (host, shared) ----
    ipp_ck = ipp_setup(n, Rng.from_int(2000))
    stage1 = stage0.process_stage0_responses(ipp_ck, mesh0)
    reqs1 = [stage1.gen_request(i) for i in range(n)]
    agg_state = stage1.into_agg_state()

    seq1 = [
        process_stage1_request(
            rng.fork(b"s1" + str(i).encode()),
            circuit_cls,
            keys.get_pk(i),
            reqs0[i],
            seq0[i],
            reqs1[i],
            backend,
        )
        for i in range(n)
    ]
    mesh1 = mp.stage1_all(rng, circuit_cls, reqs1)

    for a, b in zip(seq1, mesh1):
        assert a.subcircuit_idx == b.subcircuit_idx
        assert a.proof == b.proof, f"stage-1 proof mismatch @ {a.subcircuit_idx}"

    # ---- every mesh-produced proof verifies, and the aggregate verifies ----
    for i, resp in enumerate(mesh1):
        pvk = prepare_verifying_key(keys.get_pk(i).vk)
        assert verify_proof(pvk, resp.proof, agg_state.public_inputs), f"proof {i}"

    from hekaton_tpu.protocol.aggregation import AggProvingKey, agg_transcript
    from hekaton_tpu.protocol.tipa import tipa_key_from_ipp

    agg_pk = AggProvingKey(tipa_key_from_ipp(ipp_ck), lambda i: keys.get_pk(i))
    agg_proof = agg_state.gen_agg_proof(agg_pk, mesh1)
    assert agg_pk.verify_aggregate(
        agg_transcript(), agg_state.super_com, agg_proof, agg_state.public_inputs
    )
