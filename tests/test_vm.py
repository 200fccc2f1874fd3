"""VM workload tests (mirror of vm_constraints.rs:203-239 test_vm plus the
e2e prover layer, which the reference runs as test_vm_e2e_prover)."""
from hekaton_tpu.protocol.portal_manager import SetupVarPortalManager
from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.utils.rng import Rng
from hekaton_tpu.workloads.vm import VirtualMachine, VirtualMachineParameters


def test_vm_trace_equivalence():
    """Native get_portal_subtraces == trace from real constraint synthesis."""
    params = VirtualMachineParameters(log_num_subcircuit=3, dummy_constraint_num=30,
                                      operations_per_chunk=2)
    vm = VirtualMachine(params)
    expected = vm.get_portal_subtraces()

    pm = SetupVarPortalManager(ConstraintSystem(), "ram")
    for idx in range(vm.num_subcircuits()):
        pm.start_subtrace()
        vm.generate_constraints(pm.cs, idx, pm)
    assert pm.cs.is_satisfied()
    assert pm.subtraces == expected


def test_vm_e2e_prover():
    """Full coordinator/worker pipeline on the RAM-memory VM workload.

    n=4 (not 2) so the last subcircuit's representative is a middle index —
    this exercises the crs_plan boundary-CRS correction (the reference maps
    VM's last subcircuit onto the middle CRS, vm_constraints.rs:95, which
    yields an unverifiable proof)."""
    from hekaton_tpu.cpgroth16.backend import HostBackend
    from test_protocol import run_e2e_prover

    params = VirtualMachineParameters(log_num_subcircuit=2, dummy_constraint_num=4,
                                      operations_per_chunk=2)
    run_e2e_prover(VirtualMachine, params, HostBackend())


def test_vm_merkle_memory_path_verification():
    """Mirror of vm/memory.rs test_path_verification: one depth-32 in-circuit
    path verification is satisfiable, and costs ~9k constraints (the
    Merkle-memory cost model the mode substitutes for each portal op)."""
    from hekaton_tpu.workloads.vm import MERKLE_MEMORY_DEPTH, merkle_path_verification

    cs = ConstraintSystem()
    merkle_path_verification(cs)
    assert cs.is_satisfied()
    assert cs.num_constraints > 100 * MERKLE_MEMORY_DEPTH  # scales with depth


def test_vm_merkle_memory_mode():
    """use_merkle_memory replaces every portal op: native subtraces are empty
    (unlike the reference, whose merkle-mode traces and constraints disagree
    — vm_constraints.rs:29-85 vs memory.rs:28-52), and the constraints stay
    satisfiable with get=1/set=2 path verifications."""
    from hekaton_tpu.workloads.vm import merkle_path_verification

    params = VirtualMachineParameters(log_num_subcircuit=1, dummy_constraint_num=4,
                                      operations_per_chunk=1, use_merkle_memory=True)
    vm = VirtualMachine(params)
    traces = vm.get_portal_subtraces()
    assert len(traces) == vm.num_subcircuits()
    assert all(len(t) == 0 for t in traces)

    # one path verification's constraint count, to check op accounting
    probe = ConstraintSystem()
    merkle_path_verification(probe)
    per_path = probe.num_constraints

    pm = SetupVarPortalManager(ConstraintSystem(), "ram")
    pm.start_subtrace()
    base = pm.cs.num_constraints
    vm.generate_constraints(pm.cs, 0, pm)
    assert pm.cs.is_satisfied()
    assert pm.subtraces == [[]]
    # subcircuit 0: 16 register sets (2 paths) + 1 op (1 set + 2 gets = 4 paths)
    n_paths = 16 * 2 + 1 * 4
    got_paths = (pm.cs.num_constraints - base) // per_path
    assert got_paths == n_paths, (got_paths, n_paths)
