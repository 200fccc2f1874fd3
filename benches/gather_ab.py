"""A/B probes for the MSM v3 bottlenecks (PERFORMANCE.md):

  1. level-1 row gather: XLA `table[idx]` vs a Pallas kernel that issues one
     async DMA per row with a rotating semaphore ring (tests whether XLA's
     ~50 ns/row is a hardware floor or a single-outstanding-copy artifact);
  2. the plan's sort: argsort + two random payload gathers vs one
     multi-operand lax.sort that carries the payload through the network.

Usage: python benches/gather_ab.py [logn] [which: gather|sort|all]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    n = 1 << logn
    W, c, L = 20, 13, 32
    B = (1 << (c - 1)) + 1
    M = W * n + W * B * L // 2  # ~ production level-1 row count
    M = (M // (1 << 14)) * (1 << 14)
    T = 2 * n + 1  # table rows (x||y, x||-y halves + inf)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u32 = jnp.uint32
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.integers(0, 2**32, size=(T, 16), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, T, size=(M,), dtype=np.int32))

    def timed(name, f, *args):
        f = jax.jit(f)
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        print(f"{name}: {dt*1e3:.1f} ms  ({dt/M*1e9:.1f} ns/row, compile {tc:.0f}s)", flush=True)
        return dt

    if which in ("gather", "all"):
        # A: XLA gather (with a sum so the 1.5 GB result is reduced on device)
        def xla_gather(table, idx):
            return jnp.sum(table[idx], dtype=jnp.uint32)

        timed(f"xla gather {M/1e6:.1f}M x 64B", xla_gather, table, idx)

        # B: Pallas per-row DMA with SLOTS outstanding copies
        BLK = 1 << 13
        SLOTS = 16

        def dma_kernel(idx_ref, table_ref, out_ref, sems):
            def body(j, _):
                slot = jax.lax.rem(j, SLOTS)

                @pl.when(j >= SLOTS)
                def _():
                    # retire the DMA that used this slot (same shape/sem)
                    pltpu.make_async_copy(
                        table_ref.at[0], out_ref.at[j - SLOTS], sems.at[slot]
                    ).wait()

                pltpu.make_async_copy(
                    table_ref.at[idx_ref[j]], out_ref.at[j], sems.at[slot]
                ).start()
                return 0

            jax.lax.fori_loop(0, BLK, body, 0)

            def drain(j, _):
                slot = jax.lax.rem(j, SLOTS)
                pltpu.make_async_copy(
                    table_ref.at[0], out_ref.at[j], sems.at[slot]
                ).wait()
                return 0

            jax.lax.fori_loop(BLK - SLOTS, BLK, drain, 0)

        def pallas_gather(table, idx):
            out = pl.pallas_call(
                dma_kernel,
                grid=(M // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((BLK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, 16), jnp.uint32),
                scratch_shapes=[pltpu.SemaphoreType.DMA((SLOTS,))],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(idx, table)
            return jnp.sum(out, dtype=jnp.uint32)

        try:
            timed(f"pallas DMA gather (SLOTS={SLOTS})", pallas_gather, table, idx)
        except Exception as e:  # noqa: BLE001
            print(f"pallas DMA gather failed: {type(e).__name__}: {str(e)[:500]}")

    if which in ("sort", "all"):
        WN = W * n
        keys = jnp.asarray(rng.integers(0, W * B, size=(WN,), dtype=np.uint32))
        neg = jnp.asarray(rng.integers(0, 2, size=(WN,), dtype=np.uint32))

        def sort_a(keys, neg):
            order = jnp.argsort(keys)
            sk = keys[order]
            prow = ((order % n).astype(u32) + neg[order] * n).astype(jnp.int32)
            return jnp.sum(sk), jnp.sum(prow)

        def sort_b(keys, neg):
            payload = (
                jnp.broadcast_to(jnp.arange(n, dtype=u32)[None], (W, n)).reshape(-1)
                + neg * n
            )
            sk, prow = jax.lax.sort((keys, payload), num_keys=1)
            return jnp.sum(sk), jnp.sum(prow.astype(jnp.int32))

        timed(f"sort A: argsort + 2 payload gathers ({WN/1e6:.1f}M)", sort_a, keys, neg)
        timed(f"sort B: lax.sort multi-operand     ({WN/1e6:.1f}M)", sort_b, keys, neg)


if __name__ == "__main__":
    main()
