"""Monolithic Groth16 baseline: the same portal workload proven as a SINGLE
CP-Groth16 proof with a trivial dict-backed portal manager.

Equivalent of /root/reference/distributed-prover/benches/monolithic.rs:
the baseline the distributed prover is compared against (its trivial
HashMap portal manager is monolithic.rs:75-114).

Usage:
  python benches/monolithic.py --workload merkle --num-subcircuits 8 \
      --num-sha2-iters 1 --num-portals 4
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hekaton_tpu.r1cs.builder import ConstraintSystem, MultiStageSynthesizer
from hekaton_tpu.r1cs.gadgets import FpVar


class TrivialPortalManager:
    """Dict-backed portal manager: set stores the var, get returns it
    (monolithic.rs:75-114). No transcript, no permutation argument."""

    def __init__(self):
        self.map = {}

    def get(self, name: str) -> FpVar:
        return self.map[name]

    def set(self, name: str, val: FpVar):
        assert name not in self.map, f"duplicate portal set: {name}"
        self.map[name] = val


class MonolithicCircuit(MultiStageSynthesizer):
    """All subcircuits synthesized into one 2-stage CS (stage 0 empty so the
    CP-Groth16 pipeline applies unchanged; the reference uses plain Groth16)."""

    def __init__(self, circ):
        self.circ = circ

    def total_num_stages(self):
        return 2

    def generate_constraints(self, stage: int, cs: ConstraintSystem):
        cs.begin_stage()
        if stage == 1:
            pm = TrivialPortalManager()
            for idx in range(self.circ.num_subcircuits()):
                self.circ.generate_constraints(cs, idx, pm)
        cs.end_stage()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["chain", "merkle"], default="chain")
    ap.add_argument("--num-subcircuits", type=int, default=4)
    ap.add_argument("--num-sha2-iters", type=int, default=1)
    ap.add_argument("--num-portals", type=int, default=4)
    ap.add_argument("--backend", choices=["host", "tpu"], default="host")
    args = ap.parse_args()

    from hekaton_tpu.cpgroth16.backend import HostBackend, TpuBackend
    from hekaton_tpu.cpgroth16.generator import generate_parameters
    from hekaton_tpu.cpgroth16.prover import CommitmentBuilder
    from hekaton_tpu.cpgroth16.verifier import prepare_verifying_key, verify_proof
    from hekaton_tpu.utils.rng import Rng

    backend = TpuBackend() if args.backend == "tpu" else HostBackend()
    rng = Rng.from_int(1000)

    if args.workload == "chain":
        from hekaton_tpu.workloads.chain import PortalChainCircuit, PortalChainParams

        circ = PortalChainCircuit.rand(rng, PortalChainParams(args.num_subcircuits))
    else:
        from hekaton_tpu.workloads.merkle import MerkleTreeCircuit, MerkleTreeCircuitParams

        circ = MerkleTreeCircuit.rand(
            rng,
            MerkleTreeCircuitParams(
                args.num_subcircuits // 2, args.num_sha2_iters, args.num_portals
            ),
        )

    mono = MonolithicCircuit(circ)

    t0 = time.perf_counter()
    pk = generate_parameters(mono, Rng.from_int(42), backend)
    t_setup = time.perf_counter() - t0
    print(json.dumps({"step": "setup", "secs": round(t_setup, 3)}), flush=True)

    t0 = time.perf_counter()
    cb = CommitmentBuilder(MonolithicCircuit(circ), pk, backend)
    com, com_rand = cb.commit(Rng.from_int(7))
    proof = cb.prove([com], [com_rand], Rng.from_int(8))
    t_prove = time.perf_counter() - t0
    print(json.dumps({"step": "prove", "secs": round(t_prove, 3)}), flush=True)

    pvk = prepare_verifying_key(pk.vk)
    ok = verify_proof(pvk, proof, [])
    print(json.dumps({"step": "verify", "ok": bool(ok)}))
    assert ok


if __name__ == "__main__":
    main()
