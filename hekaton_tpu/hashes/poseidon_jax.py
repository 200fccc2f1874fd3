"""Batched Poseidon permutation/sponge over Fr on TPU.

The round-1 build had Poseidon only as host Python + an R1CS gadget
(hashes/poseidon.py); the exec-tree build (protocol/coordinator.py) was the
one O(total-trace) sequential host section — the same bottleneck as the
reference's coordinator scan (/root/reference/distributed-prover/src/
coordinator.rs:143-161). This module batches the permutation across leaves
so a whole tree level is one fused device computation: the SURVEY §2.5 P2
"on-device scan + Merkle kernel" item.

All values are (..., 16) u32 Montgomery Fr limbs (jax_field layout); the
parameters come from the same Grain-LFSR derivation as the host/gadget
paths (hashes/poseidon.py, mirror of poseidon_util.rs:53-99), so digests
are identical across host, gadget, and device.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf
from ..fields.jax_field import FR
from . import poseidon as pos

u32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _device_consts(rate: int):
    """(ark, mds) for the rate-`rate` config, packed as Montgomery limbs."""
    cfg = pos.leaf_config() if rate == 3 else pos.two_to_one_config()
    width = cfg.rate + 1
    ark = np.stack([FR.pack(row) for row in cfg.ark])  # (rounds, width, 16)
    mds = np.stack([FR.pack(row) for row in cfg.mds])  # (width, width, 16)
    return cfg, jnp.asarray(ark), jnp.asarray(mds)


def _pow_alpha(x, alpha: int):
    # alpha in {5, 17}: square chain + final multiply (matches _pow_alpha_var)
    acc = x
    n = 1
    while n * 2 <= alpha - 1:
        acc = jf.mont_sqr(FR, acc)
        n *= 2
    return jf.mont_mul(FR, acc, x)


def permute_batch(rate: int, state: list) -> list:
    """One Poseidon permutation on a list of `rate+1` batched Mont columns."""
    cfg, ark, mds = _device_consts(rate)
    width = cfg.rate + 1
    half = cfg.full_rounds // 2
    total = cfg.full_rounds + cfg.partial_rounds
    for rnd in range(total):
        state = [jf.add(FR, s, ark[rnd, i]) for i, s in enumerate(state)]
        if rnd < half or rnd >= half + cfg.partial_rounds:
            state = [_pow_alpha(s, cfg.alpha) for s in state]
        else:
            state = [_pow_alpha(state[0], cfg.alpha)] + state[1:]
        new = []
        for i in range(width):
            acc = jf.mont_mul(FR, state[0], mds[i, 0])
            for j in range(1, width):
                acc = jf.add(FR, acc, jf.mont_mul(FR, state[j], mds[i, j]))
            new.append(acc)
        state = new
    return state


def sponge_hash_batch(rate: int, cols: list):
    """Absorb the batched columns (arkworks CRH semantics: add into
    state[1 + i], permute on full rate) and squeeze one column."""
    batch = cols[0].shape[:-1]
    zero = jnp.zeros(batch + (FR.nlimbs,), u32)
    state = [zero] * (rate + 1)
    idx = 0
    for col in cols:
        if idx == rate:
            state = permute_batch(rate, state)
            idx = 0
        state[1 + idx] = jf.add(FR, state[1 + idx], col)
        idx += 1
    state = permute_batch(rate, state)
    return state[1]


def hash_leaf_batch(cols: list):
    return sponge_hash_batch(3, cols)


def hash_two_to_one_batch(left, right):
    return sponge_hash_batch(2, [left, right])


def merkle_levels_device(leaf_cols: list) -> list:
    """Full Poseidon Merkle tree on device: leaf columns -> list of level
    digest arrays (leaf-hash level first, root last), matching
    protocol.eval_tree.MerkleTree.levels."""
    level = hash_leaf_batch(leaf_cols)
    levels = [level]
    while level.shape[0] > 1:
        level = hash_two_to_one_batch(level[0::2], level[1::2])
        levels.append(level)
    return levels
