"""Device SHA-256 (hashes/sha256_jax.py) vs hashlib — batch digests at
several message lengths (single/multi-block, empty), mirroring the
reference's native-vs-gadget hash checks (vkd/hash.rs tests)."""
import hashlib

from hekaton_tpu.hashes.sha256_jax import sha256_bytes_batch


def test_sha256_jax_matches_hashlib():
    for length in (0, 55, 100):
        msgs = [bytes([(i * 31 + j) % 256 for j in range(length)]) for i in range(5)]
        got = sha256_bytes_batch(msgs)
        want = [hashlib.sha256(m).digest() for m in msgs]
        assert got == want, f"mismatch at length {length}"


def test_sha256_jax_iterated():
    """Iterated hashing (the Big-Merkle node pattern: hash-of-hash chains)."""
    cur = [b"leaf-%d" % i for i in range(4)]
    for _ in range(3):
        cur = sha256_bytes_batch(cur)
    want = [b"leaf-%d" % i for i in range(4)]
    for _ in range(3):
        want = [hashlib.sha256(m).digest() for m in want]
    assert cur == want
