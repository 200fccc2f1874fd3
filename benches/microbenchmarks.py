"""Per-step pipeline microbenchmarks.

Python equivalent of
/root/reference/distributed-prover/benches/microbenchmarks.rs:435-476: times
every pipeline step (PK gen, agg-ck gen, trace gen, stage0/1 request
generation and processing, aggregation) for a chosen workload and prints one
JSON line per step.

Usage:
  python benches/microbenchmarks.py --workload chain --num-subcircuits 4
  python benches/microbenchmarks.py --workload merkle --num-subcircuits 8 \
      --num-sha2-iters 1 --num-portals 4 --backend tpu
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(json.dumps({"step": label, "secs": round(dt, 4)}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["chain", "merkle", "vm", "vkd"], default="chain")
    ap.add_argument("--num-subcircuits", type=int, default=4)
    ap.add_argument("--num-sha2-iters", type=int, default=1)
    ap.add_argument("--num-portals", type=int, default=4)
    ap.add_argument("--backend", choices=["host", "tpu"], default="host")
    args = ap.parse_args()

    from hekaton_tpu.cpgroth16.backend import HostBackend, TpuBackend
    from hekaton_tpu.protocol.aggregation import AggProvingKey
    from hekaton_tpu.protocol.coordinator import CoordinatorStage0State, G16ProvingKeyGenerator
    from hekaton_tpu.protocol.ipp import ipp_setup
    from hekaton_tpu.protocol.tipa import tipa_key_from_ipp
    from hekaton_tpu.protocol.worker import process_stage0_request, process_stage1_request
    from hekaton_tpu.utils.fiat_shamir import Transcript
    from hekaton_tpu.utils.rng import Rng

    backend = TpuBackend() if args.backend == "tpu" else HostBackend()
    n = args.num_subcircuits
    rng = Rng.from_int(1000)

    if args.workload == "chain":
        from hekaton_tpu.workloads.chain import PortalChainCircuit as C, PortalChainParams

        params = PortalChainParams(n)
    elif args.workload == "merkle":
        from hekaton_tpu.workloads.merkle import (
            MerkleTreeCircuit as C,
            MerkleTreeCircuitParams,
        )

        params = MerkleTreeCircuitParams(n // 2, args.num_sha2_iters, args.num_portals)
    elif args.workload == "vm":
        from hekaton_tpu.workloads.vm import VirtualMachine as C, VirtualMachineParameters

        params = VirtualMachineParameters(log_num_subcircuit=(n - 1).bit_length())
    else:
        from hekaton_tpu.workloads.vkd import (
            VerifiableKeyDirectoryCircuit as C,
            VerifiableKeyDirectoryCircuitParams,
        )
        from hekaton_tpu.workloads.vkd.vkd import null_leaf_value

        params = VerifiableKeyDirectoryCircuitParams((n - 1).bit_length(), null_leaf_value())

    circ = bench("circuit_rand", lambda: C.rand(rng, params))
    n = circ.num_subcircuits()

    from hekaton_tpu.protocol.coordinator import crs_plan

    gen = G16ProvingKeyGenerator(circ, backend)
    unique, reps = crs_plan(circ)
    minimal = bench(
        f"pk_gen_x{len(unique)}",
        lambda: {i: gen.gen_pk(Rng.from_int(50 + i), i) for i in unique},
    )
    pks = [minimal[reps[i]] for i in range(n)]

    bench("trace_gen", circ.get_portal_subtraces)
    stage0 = bench("coordinator_stage0_state", lambda: CoordinatorStage0State(circ))
    reqs0 = bench("stage0_requests", lambda: [stage0.gen_request(i) for i in range(n)])
    resps0 = bench(
        f"stage0_responses_x{n}",
        lambda: [
            process_stage0_request(rng.fork(str(i).encode()), C, pks[i], reqs0[i], backend)
            for i in range(n)
        ],
    )
    ipp_ck = bench("ipp_setup", lambda: ipp_setup(n, Rng.from_int(2000)))
    stage1 = bench(
        "process_stage0_responses(exec tree)",
        lambda: stage0.process_stage0_responses(ipp_ck, resps0),
    )
    reqs1 = bench("stage1_requests", lambda: [stage1.gen_request(i) for i in range(n)])
    agg_state = stage1.into_agg_state()
    resps1 = bench(
        f"stage1_responses_x{n}",
        lambda: [
            process_stage1_request(
                rng.fork(b"s1" + str(i).encode()), C, pks[i], reqs0[i], resps0[i], reqs1[i], backend
            )
            for i in range(n)
        ],
    )
    agg_pk = bench("agg_key_gen", lambda: AggProvingKey(tipa_key_from_ipp(ipp_ck), lambda i: pks[i]))
    agg_proof = bench("aggregation", lambda: agg_state.gen_agg_proof(agg_pk, resps1))
    ok = bench(
        "aggregate_verify",
        lambda: agg_pk.verify_aggregate(
            Transcript(b"test-e2e"), agg_state.super_com, agg_proof, agg_state.public_inputs
        ),
    )
    assert ok
    print(json.dumps({"step": "done", "subcircuit_proofs": n, "verified": bool(ok)}))


if __name__ == "__main__":
    main()
