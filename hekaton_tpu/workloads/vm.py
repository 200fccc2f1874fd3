"""Mock zkVM workload: chunked execution with RAM-portal register state.

Behavioral equivalent of /root/reference/distributed-prover/src/vm/
(vm.rs, vm_constraints.rs, memory.rs): 16 registers carried between cycle
chunks through RAM portals (vm/vm.rs:4-9); each chunk reads the registers,
runs `operations_per_chunk` dummy cycles of `dummy_constraint_num` constraints
each (vm_constraints.rs:109-151), and writes the registers back. Only two
unique subcircuit shapes (vm_constraints.rs:91-97). The optional
`use_merkle_memory` mode replaces each portal op with a depth-32 Merkle path
verification (vm/memory.rs:12,28-52).

The calibration constant VM_CONSTRAINTS_PER_CYCLE = 1114 (vnTinyRAM, cited at
mpi-snark/src/lib.rs:120-122) maps `dummy_constraint_num` to real VM cycles.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..protocol.circuit_api import CircuitWithPortals
from ..protocol.portal_manager import SetupRamPortalManager
from ..r1cs.gadgets import FpVar

REGISTER_NUM = 16  # vm/vm.rs:4
VM_CONSTRAINTS_PER_CYCLE = 1114  # mpi-snark/src/lib.rs:120-122


@dataclass(frozen=True)
class VirtualMachineParameters:
    log_num_subcircuit: int
    dummy_constraint_num: int = 30
    operations_per_chunk: int = 2  # power of two
    use_merkle_memory: bool = False


class VirtualMachine(CircuitWithPortals):
    MEM_TYPE = "ram"

    def __init__(self, params: VirtualMachineParameters):
        assert not params.use_merkle_memory, "merkle-memory mode: see vm_merkle TODO"
        self.params = params

    @classmethod
    def rand(cls, rng, params):
        return cls(params)  # vm_constraints.rs:21-23: rand is just new

    @classmethod
    def new(cls, params):
        return cls(params)

    def get_params(self):
        return self.params

    def num_subcircuits(self):
        return 1 << self.params.log_num_subcircuit

    def get_unique_subcircuits(self):
        return [0, 1]

    def representative_subcircuit(self, idx):
        return 0 if idx == 0 else 1

    def get_serialized_witnesses(self, idx):
        return b""  # registers are all ONE in the mock VM (vm_constraints.rs:160-169)

    def set_serialized_witnesses(self, idx, data):
        pass

    def _dummy_ops_native(self, pm: SetupRamPortalManager):
        for _ in range(self.params.operations_per_chunk):
            pm.set("register 1", 1)
            pm.get("register 1")
            pm.get("register 1")

    def get_portal_subtraces(self):
        pm = SetupRamPortalManager()
        for idx in range(self.num_subcircuits()):
            pm.start_subtrace()
            if idx != 0:
                for i in range(REGISTER_NUM):
                    pm.get(f"register {i}")
                self._dummy_ops_native(pm)
                for i in range(REGISTER_NUM):
                    pm.set(f"register {i}", 1)
            else:
                for i in range(REGISTER_NUM):
                    pm.set(f"register {i}", 1)
                self._dummy_ops_native(pm)
        return pm.subtraces

    def generate_constraints(self, cs, subcircuit_idx, pm):
        def set_registers():
            for i in range(REGISTER_NUM):
                pm.set(f"register {i}", FpVar.witness(cs, 1))

        def get_registers():
            for i in range(REGISTER_NUM):
                pm.get(f"register {i}")

        def dummy_operation():
            for _ in range(self.params.operations_per_chunk):
                pm.set("register 1", FpVar.witness(cs, 1))
                pm.get("register 1")
                pm.get("register 1")
                for _ in range(self.params.dummy_constraint_num // 2):
                    fp1 = FpVar.witness(cs, 12)
                    fp2 = FpVar.witness(cs, 12)
                    _ = fp1 * fp2

        if subcircuit_idx != 0:
            get_registers()
            dummy_operation()
            set_registers()
        else:
            set_registers()
            dummy_operation()
