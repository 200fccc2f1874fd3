"""Device exec-tree build (running-eval scan + batched Poseidon) must be
bit-identical to the host path, for both ROM and RAM transcripts."""
import random

import jax.numpy as jnp
import numpy as np

from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.fields.jax_field import FR
from hekaton_tpu.hashes import poseidon as pos
from hekaton_tpu.hashes.poseidon_jax import hash_leaf_batch, hash_two_to_one_batch
from hekaton_tpu.protocol.coordinator import generate_exec_tree
from hekaton_tpu.protocol.eval_tree_jax import generate_exec_tree_device
from hekaton_tpu.protocol.ipp import IppCom
from hekaton_tpu.protocol.transcript import RamTranscriptEntry, RomTranscriptEntry

rng = random.Random(23)


def _pack(vals):
    return jnp.asarray(FR.pack([v % R for v in vals]))


def test_poseidon_device_matches_host():
    lefts = [rng.randrange(R) for _ in range(5)]
    rights = [rng.randrange(R) for _ in range(5)]
    got = FR.unpack(np.asarray(hash_two_to_one_batch(_pack(lefts), _pack(rights))))
    assert got == [pos.hash_two_to_one(l, r) for l, r in zip(lefts, rights)]

    # leaf hash: 4 columns (one rate-3 absorb boundary crossed)
    cols = [[rng.randrange(R) for _ in range(5)] for _ in range(4)]
    got = FR.unpack(np.asarray(hash_leaf_batch([_pack(c) for c in cols])))
    exp = [pos.hash_leaf([cols[j][i] for j in range(4)]) for i in range(5)]
    assert got == exp


class _FakeCom:
    def __init__(self, seed):
        self._b = seed

    def to_bytes(self):
        return self._b


def _rom_subtraces(ns, lens):
    sts = []
    for n in lens:
        sts.append(
            [RomTranscriptEntry(rng.randrange(1, 1000), rng.randrange(R)) for _ in range(n)]
        )
    return sts


def _ram_subtraces(lens):
    t = 0
    sts = []
    for n in lens:
        st = []
        for _ in range(n):
            st.append(
                RamTranscriptEntry(
                    rng.randrange(1, 1000), rng.randrange(R), t, bool(rng.getrandbits(1))
                )
            )
            t += 1
        sts.append(st)
    return sts


def _check(mem_type, time_sts):
    # addr-ordered: any permutation works for the scan/tree equivalence check
    flat = [e for st in time_sts for e in st]
    addr_flat = sorted(
        flat, key=(lambda e: (e.addr, e.timestamp)) if mem_type == "ram" else (lambda e: e.addr)
    )
    addr_sts, pos_i = [], 0
    for st in time_sts:
        addr_sts.append(addr_flat[pos_i : pos_i + len(st)])
        pos_i += len(st)
    com = _FakeCom(b"device-tree-test")
    t_host, l_host = generate_exec_tree(mem_type, com, time_sts, addr_sts)
    t_dev, l_dev = generate_exec_tree_device(mem_type, com, time_sts, addr_sts)
    assert t_host.root() == t_dev.root()
    assert t_host.levels == t_dev.levels
    for a, b in zip(l_host, l_dev):
        assert a.to_field_elements() == b.to_field_elements()


def test_exec_tree_device_rom():
    _check("rom", _rom_subtraces(4, [3, 0, 5, 2]))


def test_exec_tree_device_ram():
    _check("ram", _ram_subtraces([2, 4, 1, 3]))
