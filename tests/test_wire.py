"""Wire-format roundtrips (protocol/wire.py): the coordinator<->worker
message layer (reference: MPI Packed cells + fixed-size response slots,
mpi-snark/src/lib.rs:9-105)."""
import random

import hekaton_tpu.curves.host as ch
from hekaton_tpu.cpgroth16.data_structures import Proof
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.protocol import wire
from hekaton_tpu.protocol.coordinator import Stage0Request, Stage1Request
from hekaton_tpu.protocol.eval_tree import ExecTreeLeaf, MerklePath
from hekaton_tpu.protocol.transcript import (
    RamRunningEvaluation,
    RamTranscriptEntry,
    RomRunningEvaluation,
    RomTranscriptEntry,
)
from hekaton_tpu.protocol.worker import Stage0Response, Stage1Response

rng = random.Random(31)


def _g1():
    return ch.pt_mul(ch.g1_gen(), rng.randrange(1, R))


def _g2():
    return ch.pt_mul(ch.g2_gen(), rng.randrange(1, R))


def test_stage0_roundtrip_rom_and_ram():
    rom_st = [RomTranscriptEntry(i + 1, rng.randrange(R)) for i in range(5)]
    req = Stage0Request(3, rom_st, list(reversed(rom_st)))
    back = wire.stage0_request_from_bytes(wire.stage0_request_to_bytes(req, "rom"))
    assert back.subcircuit_idx == 3
    assert back.time_ordered_subtrace == rom_st
    assert back.addr_ordered_subtrace == list(reversed(rom_st))

    ram_st = [
        RamTranscriptEntry(i + 1, rng.randrange(R), i, bool(i % 2)) for i in range(4)
    ]
    req = Stage0Request(1, ram_st, ram_st)
    back = wire.stage0_request_from_bytes(wire.stage0_request_to_bytes(req, "ram"))
    assert back.time_ordered_subtrace == ram_st

    resp = Stage0Response(7, _g1(), bytes(range(32)))
    blob = wire.stage0_response_to_bytes(resp)
    assert len(blob) == wire.STAGE0_RESPONSE_SIZE  # fixed slot
    back = wire.stage0_response_from_bytes(blob)
    assert back.subcircuit_idx == 7 and back.com == resp.com and back.com_seed == resp.com_seed


def test_stage1_roundtrip():
    from hekaton_tpu.workloads.merkle import MerkleTreeCircuitParams

    evals = RomRunningEvaluation(
        rng.randrange(R), rng.randrange(R), (rng.randrange(R), rng.randrange(R))
    )
    leaf = ExecTreeLeaf(evals, RomTranscriptEntry(9, rng.randrange(R)))
    path = MerklePath(5, [rng.randrange(R) for _ in range(4)])
    req = Stage1Request(5, leaf, path, rng.randrange(R), b"witness-bytes", MerkleTreeCircuitParams(2, 1, 3))
    back = wire.stage1_request_from_bytes(
        wire.stage1_request_to_bytes(req, "rom"), MerkleTreeCircuitParams
    )
    assert back.subcircuit_idx == 5
    assert back.cur_leaf.to_field_elements() == leaf.to_field_elements()
    assert back.cur_leaf.evals.challenges == evals.challenges
    assert back.next_leaf_membership == path
    assert back.root == req.root and back.serialized_witnesses == req.serialized_witnesses
    assert back.circ_params == req.circ_params

    # RAM leaf with 4 challenges
    evals = RamRunningEvaluation(1, 2, tuple(rng.randrange(R) for _ in range(4)))
    leaf = ExecTreeLeaf(evals, RamTranscriptEntry(1, 2, 3, True))
    req = Stage1Request(0, leaf, MerklePath(0, []), 0, b"", MerkleTreeCircuitParams(2, 1, 3))
    back = wire.stage1_request_from_bytes(
        wire.stage1_request_to_bytes(req, "ram"), MerkleTreeCircuitParams
    )
    assert back.cur_leaf.evals.challenges == evals.challenges
    assert back.cur_leaf.last_subtrace_entry == leaf.last_subtrace_entry

    proof = Proof(_g1(), _g2(), _g1(), [_g1(), _g1()])
    resp = Stage1Response(2, proof)
    blob = wire.stage1_response_to_bytes(resp)
    assert len(blob) == wire.stage1_response_size(2)  # fixed slot
    back = wire.stage1_response_from_bytes(blob)
    assert back.subcircuit_idx == 2 and back.proof == proof


def test_wire_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        wire.stage0_request_from_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        wire.stage0_response_from_bytes(
            wire.stage0_request_to_bytes(Stage0Request(0, [], []), "rom")
            + b"\x00" * wire.STAGE0_RESPONSE_SIZE
        )
