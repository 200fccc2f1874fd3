"""VKD hash layer: Poseidon over byte-chunked inputs, native + in-circuit.

Behavioral equivalent of /root/reference/distributed-prover/src/vkd/hash.rs
with one TPU-first redesign: inner hashes are FULL Fr elements instead of
27-byte truncated digests. The reference truncates because its SHA-256 branch
produces 32-byte digests that don't fit in Fr (hash.rs:49-52), and its
Poseidon branch truncates "non-standardly" without constraining the
truncation in-circuit (hash.rs:146-152 allocates the truncated value as a
fresh witness). Keeping field elements end-to-end removes that gap and the
byte<->field conversions.

Byte inputs (usernames, leaves) are still chunked exactly like the reference:
INNER_HASH_SIZE(=27)-byte little-endian chunks, each < 2^216 < R
(hash.rs:95-99).
"""
from __future__ import annotations

from ...fields.bn254 import R
from ...hashes import poseidon
from ...r1cs.gadgets import FpVar

CHUNK_SIZE = 27  # INNER_HASH_SIZE (sparse_tree.rs:42)


def bytes_to_chunks(value: bytes) -> list:
    return [
        int.from_bytes(value[i : i + CHUNK_SIZE], "little")
        for i in range(0, len(value), CHUNK_SIZE)
    ]


def hash_bytes(value: bytes) -> int:
    """hash() of hash.rs:87-110 (Poseidon branch): absorb 27-byte LE chunks,
    squeeze one field element."""
    return poseidon.hash_leaf(bytes_to_chunks(value))


def hash_leaf(leaf: bytes) -> int:
    """hash_leaf (hash.rs:49-52) without the 27-byte truncation."""
    return hash_bytes(leaf)


def hash_inner_node(left: int, right: int) -> int:
    """hash_inner_node (hash.rs:55-85), full-field."""
    return poseidon.hash_two_to_one(left % R, right % R)


def witness_chunks(cs, value: bytes) -> list:
    """Allocate the byte-chunk field elements as range-bounded witnesses (the
    reference allocates UInt8 vectors, vkd_constraints.rs:256; byte-level
    booleanity == a 8*len bit bound on the chunk value)."""
    out = []
    for i in range(0, len(value), CHUNK_SIZE):
        chunk = value[i : i + CHUNK_SIZE]
        v = FpVar.witness(cs, int.from_bytes(chunk, "little"))
        v.to_bits_le(8 * len(chunk))
        out.append(v)
    return out


def hash_bytes_var(chunk_vars: list) -> FpVar:
    return poseidon.hash_leaf_var(chunk_vars)


def hash_inner_node_var(left: FpVar, right: FpVar) -> FpVar:
    return poseidon.hash_two_to_one_var(left, right)
