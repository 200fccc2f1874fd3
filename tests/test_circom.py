"""circom .r1cs interop + partitioned-R1CS workload tests (mirrors the roles
of circom-compat's format handling and partitioned_r1cs_circuit.rs)."""
import os

import pytest

from hekaton_tpu.circom import R1CSFile, read_binary_wtns, read_witness, write_witness
from hekaton_tpu.circom.r1cs_file import Header
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.r1cs.gadgets import FpVar
from hekaton_tpu.workloads.partitioned_r1cs import (
    PartitionedR1CSCircuit,
    PartitionedR1CSCircuitParams,
)


def test_r1cs_file_roundtrip():
    cs = ConstraintSystem()
    x = FpVar.witness(cs, 3)
    y = x * x  # adds a constraint
    (y * x).enforce_equal(FpVar.constant(cs, 27))

    f = R1CSFile.from_cs(cs)
    data = f.write()
    g = R1CSFile.read(data)
    assert g.header.n_wires == f.header.n_wires
    assert g.header.n_constraints == cs.num_constraints
    assert g.constraints == f.constraints

    # replay onto a fresh CS; witness comes from the exported assignment
    g.witness = f.witness
    cs2 = ConstraintSystem()
    g.generate_constraints(cs2)
    assert cs2.is_satisfied()

    # replay with a wrong witness must not satisfy
    g.witness = list(f.witness)
    g.witness[1] = (g.witness[1] + 1) % R
    cs3 = ConstraintSystem()
    g.generate_constraints(cs3)
    assert not cs3.is_satisfied()


def test_witness_json_roundtrip():
    w = [1, 1234, R - 1, 0]
    assert read_witness(write_witness(w)) == w


def test_binary_wtns():
    import io
    import struct

    w = [1, 42, 99]
    buf = io.BytesIO()
    buf.write(b"wtns")
    buf.write(struct.pack("<I", 2))
    buf.write(struct.pack("<I", 2))
    hdr = struct.pack("<I", 32) + R.to_bytes(32, "little") + struct.pack("<I", len(w))
    buf.write(struct.pack("<IQ", 1, len(hdr)))
    buf.write(hdr)
    payload = b"".join(x.to_bytes(32, "little") for x in w)
    buf.write(struct.pack("<IQ", 2, len(payload)))
    buf.write(payload)
    assert read_binary_wtns(buf.getvalue()) == w


def _write_partition(tmp_path, prefix="part"):
    """Two-subcircuit partition: sub0 proves s = a^2 and owns wire label 42;
    sub1 borrows it and proves t = s*b, owning label 43."""
    path = os.path.join(tmp_path, prefix)
    a, b = 3, 5
    s, t = a * a % R, a * a * 5 % R

    f0 = R1CSFile(
        header=Header(n_wires=3, n_pub_in=1, n_prv_in=2, n_constraints=1),
        constraints=[([(1, 1)], [(1, 1)], [(2, 1)])],  # a*a = s
        witness=[1, a, s],
    )
    open(f"{path}.0.r1cs", "wb").write(f0.write())
    open(f"{path}.0.json", "w").write(write_witness(f0.witness))
    open(f"{path}.0.meta", "w").write("1 1\n42\n")

    f1 = R1CSFile(
        header=Header(n_wires=4, n_pub_in=1, n_prv_in=3, n_constraints=1),
        constraints=[([(3, 1)], [(1, 1)], [(2, 1)])],  # s*b = t
        witness=[1, b, t],
    )
    open(f"{path}.1.r1cs", "wb").write(f1.write())
    open(f"{path}.1.json", "w").write(write_witness(f1.witness))
    open(f"{path}.1.meta", "w").write("2 1\n43\n42\n")
    return path


def test_partitioned_r1cs_traces_and_satisfiability(tmp_path):
    from hekaton_tpu.protocol.portal_manager import SetupVarPortalManager

    path = _write_partition(str(tmp_path))
    params = PartitionedR1CSCircuitParams(num_subcircuits=2, num_txs=2, file_path=path)
    circ = PartitionedR1CSCircuit(params)
    assert circ.num_subcircuits() == 4
    fast = circ.get_portal_subtraces()

    pm = SetupVarPortalManager(ConstraintSystem(), "rom")
    for idx in range(circ.num_subcircuits()):
        pm.start_subtrace()
        circ.generate_constraints(pm.cs, idx, pm)
    assert pm.cs.is_satisfied(), f"unsatisfied: {pm.cs.which_unsatisfied()}"
    assert pm.subtraces == fast


def test_partitioned_r1cs_e2e(tmp_path):
    from hekaton_tpu.cpgroth16.backend import HostBackend
    from test_protocol import run_e2e_prover

    path = _write_partition(str(tmp_path))
    params = PartitionedR1CSCircuitParams(num_subcircuits=2, num_txs=1, file_path=path)
    run_e2e_prover(PartitionedR1CSCircuit, params, HostBackend())
