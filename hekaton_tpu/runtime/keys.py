"""Setup artifact: the proving-key package written between setup and work.

Equivalent of /root/reference/mpi-snark/src/data_structures.rs ProvingKeys:
circuit id + params + `minimal_proving_keys` keyed by unique-subcircuit index
(CRS deduplication across identical subcircuit shapes,
data_structures.rs:41-110). Serialized with pickle — the package is a local
trusted artifact produced and consumed by this framework only (the reference
uses arkworks CanonicalSerialize the same way: node.rs:314-319,230-237).
"""
from __future__ import annotations

import pickle

FORMAT_VERSION = 1


class ProvingKeys:
    def __init__(self, circ_id: str, params, minimal_pks: dict, num_subcircuits: int,
                 representatives: list):
        self.circ_id = circ_id
        self.params = params
        self.minimal_pks = minimal_pks  # unique subcircuit idx -> ProvingKey
        self.num_subcircuits = num_subcircuits
        self.representatives = representatives  # idx -> unique idx

    @classmethod
    def generate(cls, circ_id: str, circ, backend, rng_factory):
        """Generate one CRS per unique subcircuit (data_structures.rs:53-110),
        with the boundary-index correction of crs_plan."""
        from ..protocol.coordinator import G16ProvingKeyGenerator, crs_plan

        gen = G16ProvingKeyGenerator(circ, backend)
        unique, reps = crs_plan(circ)
        minimal = {i: gen.gen_pk(rng_factory(i), i) for i in unique}
        return cls(circ_id, circ.get_params(), minimal, circ.num_subcircuits(), reps)

    def get_pk(self, subcircuit_idx: int):
        return self.minimal_pks[self.representatives[subcircuit_idx]]

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"version": FORMAT_VERSION, "keys": self}, f, protocol=4)

    @classmethod
    def load(cls, path: str) -> "ProvingKeys":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        assert blob["version"] == FORMAT_VERSION
        return blob["keys"]
