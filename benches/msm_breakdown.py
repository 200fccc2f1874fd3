"""Stage breakdown of msm_tpu v3 on the chip: plan (digits+sort+index math),
level-1 (gathers + mixed adds), and the tail (collapse+suffix+horner) by
subtraction from the full time. Usage: python benches/msm_breakdown.py [logn c L]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n = 1 << logn

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _make_points, _make_scalars
    from hekaton_tpu.curves.jax_curve import G1
    from hekaton_tpu.curves.proj import PROJ_G1
    from hekaton_tpu.fields import jax_field as jf
    from hekaton_tpu.msm import pippenger as pp

    u32 = jnp.uint32
    ax, ay = _make_points(n)
    sc = _make_scalars(n)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    B = (1 << (c - 1)) + 1

    def plan(ax, ay, scalars):
        N = ax.shape[0]
        mag, neg = pp.signed_digits_for_windows(scalars, c)
        W = mag.shape[0]
        NB = W * B
        keys = mag + (jnp.arange(W, dtype=u32) * jnp.uint32(B))[:, None]
        keys = keys.reshape(-1)
        payload = (
            jnp.broadcast_to(jnp.arange(N, dtype=u32)[None], (W, N)).reshape(-1)
            + neg.reshape(-1) * jnp.uint32(N)
        )
        sk, prow_u = jax.lax.sort((keys, payload), num_keys=1)
        prow = prow_u.astype(jnp.int32)
        n_in = sk.shape[0]
        ncols = n_in // L + NB
        ids = jnp.arange(NB, dtype=sk.dtype)
        starts = jnp.searchsorted(sk, ids, side="left").astype(u32)
        ends = jnp.concatenate([starts[1:], jnp.full((1,), n_in, u32)])
        counts = ends - starts
        cols_per = jnp.maximum((counts + L - 1) // L, 1)
        col_starts = jnp.concatenate([jnp.zeros(1, u32), jnp.cumsum(cols_per)[:-1].astype(u32)])
        col_idx = jnp.arange(ncols, dtype=u32)
        col_bucket = (jnp.searchsorted(col_starts, col_idx, side="right") - 1).astype(jnp.int32)
        within = col_idx - col_starts[col_bucket]
        base = starts[col_bucket] + within * jnp.uint32(L)
        cnt = counts[col_bucket]
        r = jnp.arange(L, dtype=u32)[:, None]
        off = within[None, :] * jnp.uint32(L) + r
        valid = (off < cnt[None, :]).reshape(-1)
        src_stream = jnp.where(valid, (base[None, :] + r).reshape(-1), 0).astype(jnp.int32)
        src = jnp.where(valid, prow[src_stream], 2 * N).reshape(L, ncols)
        ay_neg = jf.neg(jf.FQ, ay)
        table = jnp.concatenate(
            [
                jnp.concatenate([ax, ay], axis=-1),
                jnp.concatenate([ax, ay_neg], axis=-1),
                jnp.zeros((1, 32), u32),
            ],
            axis=0,
        )
        return src, table, col_bucket

    def plan_sum(ax, ay, scalars):
        # scalar outputs only: multi-MB outputs pay the remote-tunnel D2H
        src, table, col_bucket = plan(ax, ay, scalars)
        return jnp.sum(src), jnp.sum(col_bucket)

    def level1(ax, ay, scalars):
        src, table, col_bucket = plan(ax, ay, scalars)

        def _fetch(rr):
            return table[jax.lax.dynamic_index_in_dim(src, rr, axis=0, keepdims=False)]

        def body(rr, carry):
            acc, rows = carry
            nxt = _fetch(jnp.minimum(rr + 1, L - 1))
            acc = PROJ_G1.add_mixed(acc, rows[:, :16], rows[:, 16:])
            return acc, nxt

        acc, _ = jax.lax.fori_loop(0, L, body, (PROJ_G1.inf((src.shape[1],)), _fetch(0)))
        return jnp.sum(acc.x), jnp.sum(acc.z)

    def timed(name, fn):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(ax, ay, sc)
        np.asarray(jax.tree.leaves(out)[0])
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = f(ax, ay, sc)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        print(f"{name}: {dt:.3f}s (compile {tc:.0f}s)", flush=True)
        return dt

    t_plan = timed("plan", plan_sum)
    t_l1 = timed("plan+level1", level1)
    t_full = timed("full", lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L))
    print(
        f"breakdown @2^{logn} c={c} L={L}: plan {t_plan:.2f}s | "
        f"gather+adds {t_l1-t_plan:.2f}s | tail {t_full-t_l1:.2f}s | full {t_full:.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
