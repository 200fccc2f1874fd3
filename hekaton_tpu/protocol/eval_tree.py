"""Execution tree: Poseidon Merkle tree over per-subcircuit protocol state.

Leaf i = (running evals AFTER subcircuit i, last addr-ordered entry of
subtrace i) — /root/reference/distributed-prover/src/eval_tree.rs:53-79.
Host tree construction + auth paths, and the in-circuit membership gadget
(equivalent of ark MerkleTree + PathVar over the Poseidon tree config from
poseidon_util.rs).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..hashes import poseidon as pos
from ..r1cs.gadgets import Boolean, FpVar
from .transcript import (
    RamTranscriptEntryVar,
    RomTranscriptEntryVar,
    default_running_evaluation,
    padding_entry,
    witness_entry_var,
    witness_evals_var,
)


class ExecTreeLeaf:
    def __init__(self, evals, last_subtrace_entry):
        self.evals = evals
        self.last_subtrace_entry = last_subtrace_entry

    @staticmethod
    def padding(mem_type: str) -> "ExecTreeLeaf":
        return ExecTreeLeaf(default_running_evaluation(mem_type), padding_entry(mem_type))

    def to_field_elements(self) -> list:
        return [
            self.evals.time_ordered_eval,
            self.evals.addr_ordered_eval,
        ] + self.last_subtrace_entry.to_field_elements()


class ExecTreeLeafVar:
    def __init__(self, evals_var, last_subtrace_entry_var):
        self.evals = evals_var
        self.last_subtrace_entry = last_subtrace_entry_var

    @staticmethod
    def witness(cs, leaf: ExecTreeLeaf) -> "ExecTreeLeafVar":
        return ExecTreeLeafVar(
            witness_evals_var(cs, leaf.evals), witness_entry_var(cs, leaf.last_subtrace_entry)
        )

    def to_field_elements(self) -> list:
        return [
            self.evals.time_ordered_eval,
            self.evals.addr_ordered_eval,
        ] + self.last_subtrace_entry.to_field_elements()


# ---------------------------------------------------------------------------
# Host Merkle tree (Poseidon leaf hash rate-3, 2-to-1 rate-2)
# ---------------------------------------------------------------------------


@dataclass
class MerklePath:
    leaf_index: int
    auth_path: list  # sibling digests, leaf level first


class MerkleTree:
    def __init__(self, serialized_leaves: list):
        n = len(serialized_leaves)
        assert n & (n - 1) == 0 and n >= 2, "leaf count must be a power of two >= 2"
        self.n = n
        level = [pos.hash_leaf(leaf) for leaf in serialized_leaves]
        self.levels = [level]
        while len(level) > 1:
            level = [pos.hash_two_to_one(level[i], level[i + 1]) for i in range(0, len(level), 2)]
            self.levels.append(level)

    def root(self) -> int:
        return self.levels[-1][0]

    def generate_proof(self, leaf_index: int) -> MerklePath:
        auth = []
        idx = leaf_index
        for level in self.levels[:-1]:
            auth.append(level[idx ^ 1])
            idx >>= 1
        return MerklePath(leaf_index, auth)


def verify_path_host(root: int, path: MerklePath, serialized_leaf: list) -> bool:
    cur = pos.hash_leaf(serialized_leaf)
    idx = path.leaf_index
    for sib in path.auth_path:
        cur = pos.hash_two_to_one(sib, cur) if idx & 1 else pos.hash_two_to_one(cur, sib)
        idx >>= 1
    return cur == root


# ---------------------------------------------------------------------------
# In-circuit path verification
# ---------------------------------------------------------------------------


class MerklePathVar:
    """Witnessed auth path + position bits (like ark PathVar: the position is
    a witness so same-shape subcircuits can share one CRS)."""

    def __init__(self, siblings: list, position_bits: list):
        self.siblings = siblings  # [FpVar]
        self.position_bits = position_bits  # [Boolean], leaf level first

    @staticmethod
    def witness(cs, path: MerklePath) -> "MerklePathVar":
        sibs = [FpVar.witness(cs, s) for s in path.auth_path]
        bits = [Boolean.witness(cs, (path.leaf_index >> i) & 1) for i in range(len(path.auth_path))]
        return MerklePathVar(sibs, bits)

    def verify_membership(self, root: FpVar, serialized_leaf_vars: list):
        cur = pos.hash_leaf_var(serialized_leaf_vars)
        for sib, bit in zip(self.siblings, self.position_bits):
            left = bit.select(sib, cur)
            right = bit.select(cur, sib)
            cur = pos.hash_two_to_one_var(left, right)
        cur.enforce_equal(root)
