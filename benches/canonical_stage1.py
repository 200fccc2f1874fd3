"""Canonical-scale single-subcircuit measurement (BASELINE.md):
Big-Merkle nc=256, ns=1, np=109,462 — the reference's "1.5M-constraint
subcircuit" benchmark unit (distributed-prover/benches/microbenchmarks.rs:
272-284; its comparable timing is `Worker: computing 1 stage1 resp` on a
16-core worker, microbenchmarks.rs:221-237).

Proves ONE representative subcircuit for real on the TPU backend: real CRS
(generated at full scale), real witnesses/trace, fake stage-0 commitments
for the OTHER subcircuits (the reference's own fake-commitment pattern,
subcircuit_circuit.rs:339-346 — the exec tree and challenges are real, and
the produced Groth16 proof verifies). Records setup/commit/prove wall
times; run manually:  python benches/canonical_stage1.py [--nc 256]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nc", type=int, default=256)
    ap.add_argument("--np", type=int, default=109462)
    ap.add_argument("--idx", type=int, default=1)
    ap.add_argument("--ckpt", default="", help="pickle path to save/reuse the CRS (setup dominates reruns)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hekaton_tpu.cpgroth16.backend import TpuBackend
    from hekaton_tpu.cpgroth16.prover import CommitmentBuilder
    from hekaton_tpu.cpgroth16.verifier import prepare_verifying_key, verify_proof
    from hekaton_tpu.protocol.coordinator import CoordinatorStage0State, G16ProvingKeyGenerator
    from hekaton_tpu.protocol.ipp import ipp_setup
    from hekaton_tpu.protocol.worker import (
        Stage0Response,
        process_stage0_request_get_cb,
        process_stage1_request_with_cb,
    )
    from hekaton_tpu.utils.rng import Rng
    from hekaton_tpu.workloads.merkle import MerkleTreeCircuit, MerkleTreeCircuitParams

    t0 = time.time()

    def lap(msg):
        print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)

    backend = TpuBackend()
    params = MerkleTreeCircuitParams(args.nc // 2, 1, args.np)
    circ = MerkleTreeCircuit.rand(Rng.from_int(1000), params)
    n = circ.num_subcircuits()
    lap(f"circuit built: nc={n}, np={args.np}")

    import os
    import pickle

    t_setup = time.time()
    if args.ckpt and os.path.exists(args.ckpt):
        with open(args.ckpt, "rb") as fh:
            pk = pickle.load(fh)
        lap(f"CRS loaded from {args.ckpt}")
    else:
        gen = G16ProvingKeyGenerator(circ, backend)
        pk = gen.gen_pk(Rng.from_int(50), args.idx)
        if args.ckpt:
            with open(args.ckpt, "wb") as fh:
                pickle.dump(pk, fh, protocol=4)
    lap(
        f"CRS for subcircuit {args.idx}: domain={pk.domain_size}, "
        f"ncols={len(pk.a_g)}, setup={time.time()-t_setup:.1f}s"
    )

    stage0 = CoordinatorStage0State(circ)
    lap("coordinator stage0 state (full trace, all subcircuits)")

    rng = Rng.from_int(7)
    req0 = stage0.gen_request(args.idx)
    t_s0 = time.time()
    resp0, cb, kappa = process_stage0_request_get_cb(
        rng.fork(b"real"), MerkleTreeCircuit, pk, req0, backend
    )
    stage0_time = time.time() - t_s0
    lap(f"stage-0 commit (real): {stage0_time:.1f}s")

    # fake commitments for every other subcircuit (subcircuit_circuit.rs:339)
    import hekaton_tpu.curves.host as ch

    fake = [
        resp0 if i == args.idx else Stage0Response(i, ch.pt_mul(ch.g1_gen(), i + 3), bytes(32))
        for i in range(n)
    ]
    ipp_ck = ipp_setup(n, Rng.from_int(2000))
    stage1 = stage0.process_stage0_responses(ipp_ck, fake)
    req1 = stage1.gen_request(args.idx)
    agg_state = stage1.into_agg_state()
    lap("coordinator stage1 state (super-com + exec tree)")

    t_s1 = time.time()
    resp1 = process_stage1_request_with_cb(rng.fork(b"s1"), cb, resp0.com, kappa, req1)
    stage1_time = time.time() - t_s1
    lap(f"stage-1 prove (the comparable unit): {stage1_time:.1f}s")

    pvk = prepare_verifying_key(pk.vk)
    assert verify_proof(pvk, resp1.proof, agg_state.public_inputs), "proof must verify"
    lap("proof verified")

    # steady-state pass: same worker loop again with every executable,
    # device-resident CRS chunk, and NTT table already in place — this is
    # the number comparable to the reference's per-proof unit (its workers
    # hold the PK in RAM and prove hundreds of subcircuits per run)
    rng2 = Rng.from_int(8)
    t_s0w = time.time()
    resp0w, cbw, kappaw = process_stage0_request_get_cb(
        rng2.fork(b"real"), MerkleTreeCircuit, pk, req0, backend
    )
    stage0_warm = time.time() - t_s0w
    t_s1w = time.time()
    resp1w = process_stage1_request_with_cb(rng2.fork(b"s1"), cbw, resp0w.com, kappaw, req1)
    stage1_warm = time.time() - t_s1w
    assert verify_proof(pvk, resp1w.proof, agg_state.public_inputs), "warm proof must verify"
    lap(f"steady-state pass: stage0={stage0_warm:.1f}s stage1={stage1_warm:.1f}s (verified)")

    print(
        f"\nRESULT nc={n} np={args.np} domain={pk.domain_size} ncols={len(pk.a_g)}: "
        f"stage1_resp={stage1_time:.1f}s stage0_commit={stage0_time:.1f}s "
        f"steady_state_stage1={stage1_warm:.1f}s steady_state_stage0={stage0_warm:.1f}s "
        f"(reference unit: 1 stage1 resp / 1.5M-constraint subcircuit / 16-core worker)"
    )


if __name__ == "__main__":
    main()
