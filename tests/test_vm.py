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
