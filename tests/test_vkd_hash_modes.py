"""VKD dual hash layer (vkd/hash.rs HASH_TYPE switch): SHA-256 mode must
match hashlib natively, the gadgets must match the native functions in BOTH
modes, and the sparse-tree path machinery must work under SHA-256."""
import hashlib

import pytest

from hekaton_tpu.r1cs.builder import ConstraintSystem
from hekaton_tpu.workloads.vkd import hash as vh
from hekaton_tpu.workloads.vkd.sparse_tree import (
    MerkleIndex,
    MerkleTreePathVar,
    SparseMerkleTree,
)


@pytest.fixture
def sha_mode():
    prev = vh.set_hash_type("sha256")
    yield
    vh.set_hash_type(prev)


def test_sha256_native_matches_hashlib(sha_mode):
    data = b"hekaton-vkd-test-input-0123456789"
    want = int.from_bytes(hashlib.sha256(data).digest()[:27], "little")
    assert vh.hash_bytes(data) == want
    l, r = vh.hash_bytes(b"left"), vh.hash_bytes(b"right")
    comb = l.to_bytes(27, "little") + r.to_bytes(27, "little")
    want_inner = int.from_bytes(hashlib.sha256(comb).digest()[:27], "little")
    assert vh.hash_inner_node(l, r) == want_inner


@pytest.mark.parametrize("mode", ["poseidon", "sha256"])
def test_hash_gadgets_match_native(mode):
    prev = vh.set_hash_type(mode)
    try:
        cs = ConstraintSystem()
        data = bytes(range(54))
        chunks = vh.witness_chunks(cs, data)
        hv = vh.hash_bytes_var(chunks)
        assert hv.value == vh.hash_bytes(data)

        from hekaton_tpu.r1cs.gadgets import FpVar

        l = vh.hash_bytes(b"l")
        r = vh.hash_bytes(b"r")
        iv = vh.hash_inner_node_var(FpVar.witness(cs, l), FpVar.witness(cs, r))
        assert iv.value == vh.hash_inner_node(l, r)
        assert cs.is_satisfied()
    finally:
        vh.set_hash_type(prev)


def test_sparse_tree_under_sha256(sha_mode):
    """Insert/lookup/path-verify + the path GADGET at a small depth under the
    SHA-256 hash layer (hash.rs:33 flipped to Sha256)."""
    depth = 4
    tree = SparseMerkleTree(depth)
    leaf = b"\x07" * 32
    idx = SparseMerkleTree.get_index(vh.hash_leaf(leaf), depth)
    tree.insert(idx, leaf, "leaf")
    path = tree.lookup_path(idx)
    assert path.verify(tree.root, leaf, idx.to_bit_vector(), "leaf")

    from hekaton_tpu.r1cs.gadgets import Boolean

    cs = ConstraintSystem()
    leaf_var = vh.hash_bytes_var(vh.witness_chunks(cs, leaf))
    bits = [Boolean.witness(cs, (idx.index >> j) & 1) for j in range(depth)]
    pv = MerkleTreePathVar(cs, path)
    root_var = pv.compute_root_var_from_internal_node(leaf_var, bits)
    assert root_var.value == tree.root
    assert cs.is_satisfied()
