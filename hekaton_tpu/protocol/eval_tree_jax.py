"""Device exec-tree construction: running-eval scan + Poseidon Merkle kernel.

Replaces the coordinator's only O(total-trace) sequential host section
(protocol/coordinator.py generate_exec_tree, mirroring the reference's
coordinator scan at /root/reference/distributed-prover/src/coordinator.rs:143-161)
with batched device compute:

  1. each transcript entry's compressed representation and grand-product
     term (tr_chal - repr) is computed batched over the WHOLE trace;
  2. the running grand products (time- and addr-ordered) are an inclusive
     prefix product — associative, so one log-depth jax.lax.associative_scan
     of Montgomery multiplies instead of T sequential host multiplies;
  3. per-subcircuit boundary evals are a gather, and the Poseidon Merkle
     levels hash batched (hashes/poseidon_jax.py).

Digests and evals are bit-identical to the host path (tested in
tests/test_eval_tree_device.py); the coordinator switches paths via
generate_exec_tree(..., device=True).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf
from ..fields.bn254 import R
from ..fields.jax_field import FR
from ..hashes.poseidon_jax import merkle_levels_device
from .eval_tree import ExecTreeLeaf, MerkleTree, POSEIDON_TREE_HASH, TREE_HASH
from .transcript import ROM, padding_entry

u32 = jnp.uint32


def _pack_mont(vals) -> jnp.ndarray:
    return jnp.asarray(FR.pack([int(v) % R for v in vals]))


def _terms(entries, challenges):
    """Batched tr_chal - repr(entry) for a flat entry list (Mont limbs)."""
    if len(challenges) == 2:  # ROM: repr = val + entry_chal * addr
        entry_chal, tr_chal = challenges
        val = _pack_mont([e.val for e in entries])
        addr = _pack_mont([e.addr for e in entries])
        rep = jf.add(FR, val, jf.mont_mul(FR, _pack_mont([entry_chal] * 1), addr))
    else:  # RAM: repr = val + c1*addr + c2*timestamp + c3*read
        c1, c2, c3, tr_chal = challenges
        val = _pack_mont([e.val for e in entries])
        addr = _pack_mont([e.addr for e in entries])
        ts = _pack_mont([e.timestamp for e in entries])
        rd = _pack_mont([int(e.read) for e in entries])
        rep = jf.add(FR, val, jf.mont_mul(FR, _pack_mont([c1]), addr))
        rep = jf.add(FR, rep, jf.mont_mul(FR, _pack_mont([c2]), ts))
        rep = jf.add(FR, rep, jf.mont_mul(FR, _pack_mont([c3]), rd))
    return jf.sub(FR, _pack_mont([tr_chal]), rep)


def _prefix_products(terms) -> jnp.ndarray:
    """Inclusive prefix product over axis 0 (Montgomery mul combine)."""
    return jax.lax.associative_scan(lambda a, b: jf.mont_mul(FR, a, b), terms, axis=0)


def generate_exec_tree_device(mem_type, super_com, time_sts, addr_sts):
    """Drop-in for coordinator.generate_exec_tree: same (tree, leaves), with
    the scan + leaf/level hashing on device. Requires the Poseidon tree hash
    (the device kernel IS Poseidon); callers with a swapped test hash use
    the host path."""
    from .transcript import new_running_evaluation

    assert TREE_HASH is POSEIDON_TREE_HASH, "device exec tree is Poseidon-only"
    evals0 = new_running_evaluation(mem_type, super_com.to_bytes())
    challenges = evals0.challenge_list()

    flat_time = [e for st in time_sts for e in st]
    flat_addr = [e for st in addr_sts for e in st]
    ns = len(time_sts)
    if flat_time:
        t_scan = _prefix_products(_terms(flat_time, challenges))
        a_scan = _prefix_products(_terms(flat_addr, challenges))
        one = _pack_mont([1]).reshape(1, -1)
        t_scan = jnp.concatenate([one, t_scan], axis=0)
        a_scan = jnp.concatenate([one, a_scan], axis=0)
        bounds = np.cumsum([len(st) for st in time_sts])  # eval AFTER subcircuit i
        t_evals = FR.unpack(np.asarray(t_scan[bounds]))
        a_evals = FR.unpack(np.asarray(a_scan[bounds]))
    else:  # no portals anywhere: every running eval stays 1
        t_evals = a_evals = [1] * ns

    # leaves: (evals after subcircuit i, last addr-ordered entry of subtrace i)
    leaves = []
    last_entry = padding_entry(mem_type)
    for i in range(ns):
        if addr_sts[i]:
            last_entry = addr_sts[i][-1]
        ev = evals0.clone()
        ev.time_ordered_eval = t_evals[i]
        ev.addr_ordered_eval = a_evals[i]
        leaves.append(ExecTreeLeaf(ev, last_entry))

    # device Poseidon over the serialized leaves
    fields = [leaf.to_field_elements() for leaf in leaves]
    nfields = len(fields[0])
    cols = [_pack_mont([f[j] for f in fields]) for j in range(nfields)]
    levels_dev = merkle_levels_device(cols)
    levels = [FR.unpack(np.asarray(lv)) for lv in levels_dev]
    tree = MerkleTree.from_levels(levels)
    return tree, leaves
