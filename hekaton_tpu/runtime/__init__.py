"""Distributed runtime: SPMD batch prover over a TPU device mesh.

Replaces the reference's mpi-snark crate (OpenMPI scatter/gather star
topology, /root/reference/mpi-snark/src/bin/node.rs:461-604) with
`shard_map` over a `jax.sharding.Mesh` — subcircuits sharded over the "sub"
axis (the reference's inter-node data parallelism, SURVEY.md §2.5 P1),
MSM point ranges sharded over the "pts" axis with collective bucket
reduction (P4).
"""
from .spmd import (  # noqa: F401
    DistributedProverStep,
    fold_partials,
    make_mesh,
    sharded_msm_fn,
)
