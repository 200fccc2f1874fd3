"""Batched SHA-256 on device (JAX): vectorized compression over lanes.

The reference hashes natively on the CPU (sha2 crate — e.g. fast trace
generation in /root/reference/distributed-prover/src/tree_hash_circuit.rs:
407-417 and the VKD hash layer vkd/hash.rs:44-47). Here the batch axis is
the vector lane: one traced compression round sequence processes N
independent messages at once (u32 word ops map 1:1 onto the VPU), which
serves bulk leaf hashing / trace generation, alongside hashes/poseidon_jax
for the Poseidon side. Verified against hashlib in
tests/test_sha256_jax.py.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

u32 = jnp.uint32

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def sha256_compress(state, block):
    """One compression: state (..., 8) u32, block (..., 16) u32 big-endian
    words -> new state (..., 8). Batched over leading axes.

    Both the message schedule and the 64 rounds run as `lax.scan` loops
    (sliding 16-word window carry for the schedule) rather than unrolled
    chains: one traced round body instead of a 64-deep op chain keeps the
    HLO small and compile fast, and XLA executes the loop natively."""
    w0 = jnp.moveaxis(block, -1, 0)  # (16, ...)

    def sched_step(win, _):
        # win: (16, ...) sliding window holding w[t-16..t-1]
        s0 = _rotr(win[1], 7) ^ _rotr(win[1], 18) ^ (win[1] >> 3)
        s1 = _rotr(win[14], 17) ^ _rotr(win[14], 19) ^ (win[14] >> 10)
        wt = win[0] + s0 + win[9] + s1
        return jnp.concatenate([win[1:], wt[None]], axis=0), wt

    _, wext = jax.lax.scan(sched_step, w0, None, length=48)
    w = jnp.concatenate([w0, wext], axis=0)  # (64, ...)

    def round_step(st, kw):
        a, b, c, d, e, f, g, h = st
        kt, wt = kw
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return (t1 + S0 + maj, a, b, c, d + t1, e, f, g), None

    init = tuple(state[..., i] for i in range(8))
    fin, _ = jax.lax.scan(round_step, init, (jnp.asarray(_K), w))
    return jnp.stack(fin, axis=-1) + state


def _bytes_to_blocks(data: bytes) -> np.ndarray:
    """SHA-256 padding for one message -> (nblocks, 16) u32 words."""
    bit_len = len(data) * 8
    data = data + b"\x80"
    while (len(data) + 8) % 64:
        data = data + b"\x00"
    data = data + bit_len.to_bytes(8, "big")
    arr = np.frombuffer(data, dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def sha256_bytes_batch(messages: list[bytes]) -> list[bytes]:
    """Digest a batch of equal-length messages on device. Returns digests
    as 32-byte strings (host round-trip; for in-graph use, call
    sha256_compress directly on word tensors)."""
    assert messages and all(len(m) == len(messages[0]) for m in messages), (
        "batch must be equal-length (one traced program per message shape)"
    )
    blocks = np.stack([_bytes_to_blocks(m) for m in messages])  # (N, nb, 16)
    out = _digest_fn(blocks.shape[1])(jnp.asarray(blocks))
    return [bytes(np.asarray(d).astype(">u4").tobytes()) for d in out]


@functools.lru_cache(maxsize=None)
def _digest_fn(nblocks: int):
    def run(blocks):  # (N, nb, 16)
        state = jnp.broadcast_to(jnp.asarray(IV), blocks.shape[:1] + (8,))
        for i in range(nblocks):
            state = sha256_compress(state, blocks[:, i, :])
        return state

    return jax.jit(run)
