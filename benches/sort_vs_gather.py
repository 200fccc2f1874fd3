"""Decision microbench: move the MSM point stream into digit order by
(a) payload-carrying lax.sort of the FULL 64 B rows (16 u32 operands ride
the sort network — locality-friendly, bandwidth-shaped), vs
(b) the current plan: key+row-id sort, then one random 64 B-row gather
(latency-bound: ~24 ns/row measured at 2^20 scale).

Usage: python benches/sort_vs_gather.py [log2n_stream]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logm = int(sys.argv[1]) if len(sys.argv) > 1 else 24  # ~21M stream at 2^20 MSM
    m = (1 << logm) + (1 << (logm - 2))  # ~21M when logm=24

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    keys = jnp.asarray(rng.randint(0, 82000, size=m).astype(np.uint32))
    n_tab = 1 << 21  # 2N+1-ish table rows
    table = jnp.asarray(rng.randint(0, 2**31, size=(n_tab, 16)).astype(np.uint32))
    rows_words = [jnp.asarray(rng.randint(0, 2**31, size=m).astype(np.uint32)) for _ in range(16)]
    ids = jnp.asarray(rng.randint(0, n_tab, size=m).astype(np.uint32))

    def timed(name, f, *a):
        fn = jax.jit(f)
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return dt

    # (a) full-payload sort: key + 16 word operands
    def full_sort(keys, *words):
        out = jax.lax.sort((keys,) + words, num_keys=1)
        return tuple(jnp.sum(w) for w in out[1:3])

    # (b) id sort + random row gather
    def id_sort_gather(keys, ids, table):
        sk, sid = jax.lax.sort((keys, ids), num_keys=1)
        rows = table[sid.astype(jnp.int32)]
        return jnp.sum(sk), jnp.sum(rows[:, 0])

    # (c) raw random gather only (the floor of (b)'s second stage)
    def raw_gather(ids, table):
        rows = table[ids.astype(jnp.int32)]
        return jnp.sum(rows[:, 0])

    # (d) sort with 8 wider ops? — key + 8 payload words (half-row, for scaling law)
    def half_sort(keys, *words):
        out = jax.lax.sort((keys,) + words[:8], num_keys=1)
        return tuple(jnp.sum(w) for w in out[1:3])

    timed("id-sort+gather (current plan shape)", id_sort_gather, keys, ids, table)
    timed("raw 64B-row random gather", raw_gather, ids, table)
    timed("full-payload sort (16 words)", full_sort, keys, *rows_words)
    timed("half-payload sort (8 words)", half_sort, keys, *rows_words)


def monotone():
    """Part 2: monotone-index row gather + relayout costs (run: ... mono)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import time as _t

    m = 21 * (1 << 20)          # sorted-stream rows
    out_n = 23_600_000          # slab rows (incl. pad hits at row m)
    rng = np.random.RandomState(5)
    stream = jnp.asarray(rng.randint(0, 2**31, size=(m + 1, 16)).astype(np.uint32))
    idx_sorted = np.sort(rng.randint(0, m, size=out_n)).astype(np.int32)
    idx_mono = jnp.asarray(idx_sorted)
    # strided-monotone: the "row-order" pattern (stride ~L within a sweep)
    words = [jnp.asarray(rng.randint(0, 2**31, size=m + 1).astype(np.uint32)) for _ in range(16)]

    def timed(name, f, *a):
        fn = jax.jit(f)
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for _ in range(3):
            t0 = _t.time()
            out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(_t.time() - t0)
        print(f"{name}: {sorted(ts)[1]*1e3:.1f} ms", flush=True)

    timed("monotone 64B-row gather (23.6M rows)", lambda s, i: jnp.sum(s[i][:, 0] ^ s[i][:, 7]), stream, idx_mono)
    timed(
        "plane stack (16,n)->(n,16) relayout",
        lambda *w: jnp.sum(jnp.stack(w, axis=-1)[:, 3]),
        *words,
    )
    timed(
        "plane monotone u32 gather x16",
        lambda i, *w: sum(jnp.sum(x[i]) for x in w),
        idx_mono,
        *words,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "mono":
        monotone()
    else:
        main()
