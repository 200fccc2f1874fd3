"""Stage breakdown of msm_tpu on the chip: plan (digits + payload sort
+ index machinery + table pack), level-1 (pipelined gathers + point adds),
and the tail (superlevel collapse + suffix scan + horner) by subtraction
from the full time. Times the PRODUCTION stage functions
(pippenger._plan_tpu / _level1_tpu), not a re-implementation.
Usage: python benches/msm_breakdown.py [logn c L depth p_super accum]
  accum: affine (v5, default) | proj (v4 RCB)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    p_super = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    accum = sys.argv[6] if len(sys.argv) > 6 else "affine"
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

    ax, ay = _make_points(n)
    sc = _make_scalars(n)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    neg_fn = lambda y: jf.neg(jf.FQ, y)

    def plan_sum(ax, ay, scalars):
        # scalar outputs only: multi-MB outputs pay the remote-tunnel D2H
        src, table, col_bucket, _ = pp._plan_tpu(ax, ay, scalars, c, L, 254, neg_fn)
        return jnp.sum(src), jnp.sum(col_bucket), jnp.sum(table[:2])

    def level1(ax, ay, scalars):
        src, table, col_bucket, (W, B, NB, n_in, ncols, _) = pp._plan_tpu(
            ax, ay, scalars, c, L, 254, neg_fn
        )
        if accum == "affine":
            from hekaton_tpu.curves.affine import AFF_G1

            acc = pp._level1_tpu(
                AFF_G1, src, table, ncols, L, ax.shape[1:], depth=depth, step=AFF_G1.add_packed
            )
            return jnp.sum(acc.x), jnp.sum(acc.y)
        acc = pp._level1_tpu(PROJ_G1, src, table, ncols, L, ax.shape[1:], depth=depth)
        return jnp.sum(acc.x), jnp.sum(acc.z)

    def collapse(ax, ay, scalars):
        src, table, col_bucket, (W, B, NB, n_in, ncols, _) = pp._plan_tpu(
            ax, ay, scalars, c, L, 254, neg_fn
        )
        if accum == "affine":
            from hekaton_tpu.curves.affine import AFF_G1

            ops_ = AFF_G1
            acc = pp._level1_tpu(
                ops_, src, table, ncols, L, ax.shape[1:], depth=depth, step=AFF_G1.add_packed
            )
        else:
            ops_ = PROJ_G1
            acc = pp._level1_tpu(ops_, src, table, ncols, L, ax.shape[1:], depth=depth)
        d, acc2, M = pp._collapse_columns(
            ops_, col_bucket, acc, ncols, NB, L, n, n_in, p=p_super
        )
        return jnp.sum(d), jnp.sum(acc2.x)

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
    t_col = timed("plan+level1+collapse", collapse)
    t_full = timed(
        "full",
        lambda x, y, s: pp.msm_tpu(
            G1, x, y, s, c=c, L=L, depth=depth, p_super=p_super, accum=accum
        ),
    )
    print(
        f"breakdown @2^{logn} c={c} L={L} depth={depth} p={p_super} {accum}: plan {t_plan:.2f}s | "
        f"gather+adds {t_l1-t_plan:.2f}s | collapse {t_col-t_l1:.2f}s | "
        f"suffix+horner {t_full-t_col:.2f}s | full {t_full:.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
